"""TPU-native DSP kernels for speech feature extraction.

This package holds the batched JAX/XLA implementations that replace
the Kaldi C++ kernels of the reference toolbox. All functions operate
on padded batches ``[batch, time]`` with explicit per-utterance sample
counts, compile once per (options, bucket-size) pair, and run the hot
path (FFT, mel/DCT matmuls, scans) on the TPU MXU/VPU.
"""
