#!/usr/bin/env python
"""Corpus-scale ABX feature preparation, end to end on one chip.

The TPU-native counterpart of the reference's ``examples/features_abx``
SLURM recipe (``run.sh`` + ``scripts/``): where the reference schedules
per-speaker VTLN training and per-config feature extraction as cluster
jobs exchanging files, here the whole path — VTLN training (UBM-GMM EM,
41-warp-class LVTLN), warped MFCC extraction, per-speaker CMVN, deltas
— runs as batched device programs in one process, and the ABX-input
features land in h5features-layout ``.h5f`` files ready for the ABX
evaluation tooling.

Usage (real corpus, utterances file with speakers):

    python features_abx.py output_dir --utterances utts.txt

or self-contained on a synthetic multi-speaker corpus:

    python features_abx.py output_dir --synthetic 200

It prints one wall-clock + real-time-factor line per stage and an
end-to-end figure (including host IO) — the honest corpus-level
number, as opposed to the fused serving-kernel throughput of bench.py.
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import numpy as np


def make_synthetic_corpus(directory, nutts, nspeakers=10, rate=16000):
    """A multi-speaker corpus of speech-like WAVs (per-speaker F0 and
    formant-band identity so VTLN has real speaker structure)."""
    import scipy.io.wavfile

    os.makedirs(directory, exist_ok=True)
    items = []
    for i in range(nutts):
        speaker = i % nspeakers
        path = os.path.join(directory, f'utt{i:04d}.wav')
        if not os.path.isfile(path):
            rng = np.random.RandomState(1000 + i)
            seconds = 4.0 + (i % 5)
            t = np.arange(int(seconds * rate)) / rate
            f0 = 90 + 12 * speaker + 10 * np.sin(2 * np.pi * 0.6 * t)
            phase = 2 * np.pi * np.cumsum(f0) / rate
            voiced = sum(
                (0.6 ** k) * np.sin((k + 1) * phase) for k in range(8))
            envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.7 * t - 0.5)) ** 2
            signal = voiced * envelope + rng.randn(len(t)) * 0.03
            signal = signal / np.abs(signal).max() * 0.7
            scipy.io.wavfile.write(
                path, rate, (signal * 2 ** 15 * 0.9).astype(np.int16))
        items.append((f'utt{i:04d}', path, f'spk{speaker:02d}'))
    return items


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('output_dir')
    parser.add_argument(
        '--utterances', help='utterances index file (with speakers)')
    parser.add_argument(
        '--synthetic', type=int, default=0, metavar='N',
        help='generate a synthetic N-utterance corpus instead')
    parser.add_argument(
        '--vtln-duration', type=float, default=100.0,
        help='seconds of audio per speaker for VTLN training')
    args = parser.parse_args()

    from shennong_tpu import Utterances
    from shennong_tpu.logger import get_logger
    from shennong_tpu.pipeline import extract_features, get_default_config
    from shennong_tpu.processor import VtlnProcessor
    from shennong_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log = get_logger('abx', 'info')
    os.makedirs(args.output_dir, exist_ok=True)

    if args.synthetic:
        items = make_synthetic_corpus(
            os.path.join(args.output_dir, 'corpus'), args.synthetic)
        utterances = Utterances(items)
    elif args.utterances:
        utterances = Utterances.load(args.utterances)
    else:
        parser.error('pass --utterances or --synthetic N')

    total_audio = sum(utt.duration for utt in utterances)
    log.info(
        'corpus: %d utterances, %d speakers, %.1f minutes',
        len(utterances), len(utterances.by_speaker()), total_audio / 60)

    timings = {}

    # --- step 1: per-speaker VTLN warps (duration-bounded training,
    # as the reference recipe does) --------------------------------
    t0 = time.time()
    training = utterances.fit_to_duration(
        args.vtln_duration, truncate=True, shuffle=False)
    vtln = VtlnProcessor()
    vtln.set_logger('warning')
    warps = vtln.process(training, group_by='speaker')
    warps_file = os.path.join(args.output_dir, 'warps.yaml')
    if os.path.exists(warps_file):
        os.unlink(warps_file)
    vtln.warps = warps
    vtln.save_warps(warps_file)
    timings['vtln training'] = time.time() - t0
    log.info('warps: %s', {k: round(v, 3) for k, v in warps.items()})

    # --- step 2: the ABX feature configurations -------------------
    configs = {
        'mfcc': dict(features='mfcc'),
        'mfcc_cmvn': dict(features='mfcc', with_cmvn=True),
        'mfcc_vtln_cmvn': dict(
            features='mfcc', with_cmvn=True, use_warps=True),
    }
    for name, spec in configs.items():
        t0 = time.time()
        config = get_default_config(
            spec['features'], with_cmvn=spec.get('with_cmvn', False),
            with_delta=True)
        features = extract_features(
            config, utterances,
            warps=warps if spec.get('use_warps') else None)
        out = os.path.join(args.output_dir, f'{name}.h5f')
        if os.path.exists(out):
            os.unlink(out)
        features.save(out)
        timings[f'extract {name}'] = time.time() - t0

    # --- report ----------------------------------------------------
    print()
    print(f'{"stage":<24}{"wall (s)":>10}{"xRT":>10}')
    for stage, wall in timings.items():
        print(f'{stage:<24}{wall:>10.2f}{total_audio / wall:>10.0f}')
    end_to_end = sum(timings.values())
    print(f'{"END TO END":<24}{end_to_end:>10.2f}'
          f'{total_audio / end_to_end:>10.0f}')
    print(f'\nfeatures written to {args.output_dir}/*.h5f '
          f'(h5features layout, ready for abx-task/abx-score)')


if __name__ == '__main__':
    main()
