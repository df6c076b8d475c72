#!/usr/bin/env python
"""Hour-scale extraction demo: chunked paths on one chip.

The reference processes long recordings by splitting them externally;
here the processors route oversize signals through bounded-memory
chunked device programs automatically (doc/features.md "Long
recordings"): frame computers past 60k frames, the Kaldi pitch
tracker with Viterbi context halos, and CREPE with device-resident
salience. This demo synthesizes an N-minute waveform and reports
wall-clock and real-time factors per extractor.

Usage:
    python long_audio.py [--minutes 2] [--crepe]
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import numpy as np


def make_signal(minutes, rate=16000):
    n = int(minutes * 60 * rate)
    t = np.arange(n) / rate
    rng = np.random.RandomState(0)
    f0 = 120 + 25 * np.sin(2 * np.pi * 0.23 * t)
    phase = 2 * np.pi * np.cumsum(f0) / rate
    sig = sum((0.6 ** k) * np.sin((k + 1) * phase) for k in range(5))
    sig = (sig * (0.5 + 0.5 * np.sin(2 * np.pi * 1.1 * t) ** 2)
           + 0.02 * rng.randn(n))
    return (sig / np.abs(sig).max() * 0.6).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--minutes', type=float, default=2.0)
    parser.add_argument(
        '--crepe', action='store_true',
        help='also run CREPE (needs the tiny weights, installed)')
    args = parser.parse_args()

    from shennong_tpu import utils
    utils.enable_compilation_cache()

    from shennong_tpu.audio import Audio
    from shennong_tpu.processor import (
        KaldiPitchProcessor, MfccProcessor, PlpProcessor)

    audio = Audio(make_signal(args.minutes), 16000)
    seconds = audio.duration
    print(f'{seconds:.0f} s of audio '
          f'({int(seconds / 0.01)} frames at 10 ms shift)')

    stages = [
        ('mfcc', MfccProcessor(dither=0)),
        ('plp+rasta', PlpProcessor(rasta=True)),
        ('kaldi pitch', KaldiPitchProcessor()),
    ]
    if args.crepe:
        from shennong_tpu.processor import CrepePitchProcessor
        stages.append(
            ('crepe', CrepePitchProcessor(model_capacity='tiny')))

    print(f'{"stage":<14} {"cold (s)":>9} {"warm (s)":>9} {"xRT":>8}')
    for name, proc in stages:
        t0 = time.perf_counter()
        feats = proc.process(audio)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        feats = proc.process(audio)
        warm = time.perf_counter() - t0
        print(f'{name:<14} {cold:>9.1f} {warm:>9.1f} '
              f'{seconds / warm:>8.0f}  -> {feats.shape}')


if __name__ == '__main__':
    main()
