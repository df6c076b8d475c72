#!/usr/bin/env python
"""Compare the Kaldi and CREPE pitch trackers under noise.

The TPU-native counterpart of the reference's
examples/pitch_comparison study (which scores both trackers on the
KEELE corpus under gaussian/babble noise at several SNRs — the corpus
downloads are not reachable here, so this version runs on any local
recording, degrades it with gaussian noise at the same SNR grid, and
reports tracker agreement per condition).

Usage:
    python pitch_comparison.py <audio-file> [--plot out.png]
"""

import argparse
import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from shennong_tpu.audio import Audio
from shennong_tpu.processor import CrepePitchProcessor, KaldiPitchProcessor

SNR_LIST = [-15, -10, -5, 0, 5, 10, 15, float('inf')]  # dB, as upstream


def add_noise(audio, snr_db, seed=0):
    """The signal mixed with gaussian noise at a given SNR"""
    if np.isinf(snr_db):
        return audio
    signal = audio.data.astype(np.float64)
    power = np.mean(signal ** 2)
    noise_power = power / (10 ** (snr_db / 10))
    noise = np.random.RandomState(seed).randn(len(signal))
    noisy = signal + noise * np.sqrt(noise_power)
    peak = np.abs(noisy).max()
    if peak >= 2 ** 15:  # rescale into the int16 range
        noisy *= (2 ** 15 - 1) / peak
    return Audio(noisy.astype(np.int16), audio.sample_rate)


def track(audio):
    """((kaldi nccf, f0), (crepe confidence, f0)) per frame"""
    kaldi = KaldiPitchProcessor(
        sample_rate=audio.sample_rate).process(audio)
    crepe = CrepePitchProcessor(model_capacity='tiny').process(audio)
    nframes = min(kaldi.nframes, crepe.nframes)
    return kaldi.data[:nframes], crepe.data[:nframes]


def compare(kaldi, crepe, confidence_threshold=0.5):
    """Agreement statistics between the two trackers"""
    voiced = crepe[:, 0] >= confidence_threshold
    both = voiced & (kaldi[:, 1] > 0) & (crepe[:, 1] > 0)
    if not both.any():
        return {'voiced_pct': 0.0, 'mean_abs_cents': float('nan'),
                'within_50c_pct': float('nan')}
    cents = 1200 * np.abs(np.log2(kaldi[both, 1] / crepe[both, 1]))
    return {
        'voiced_pct': 100 * both.mean(),
        'mean_abs_cents': float(np.mean(cents)),
        'within_50c_pct': 100 * float(np.mean(cents <= 50))}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        'audio', nargs='?',
        default=os.path.join(
            os.path.dirname(__file__), os.pardir,
            'tests', 'data', 'test.wav'))
    parser.add_argument('--plot', help='write an F0-track figure (PNG)')
    args = parser.parse_args()

    clean = Audio.load(args.audio).channel(0)
    print(f'audio: {args.audio} ({clean.duration:.2f} s '
          f'@ {clean.sample_rate} Hz)')
    print(f'{"SNR dB":>8s} {"voiced %":>9s} {"|Δf0| cents":>12s} '
          f'{"within 50c %":>13s}')

    tracks = {}
    for snr in SNR_LIST:
        kaldi, crepe = track(add_noise(clean, snr))
        stats = compare(kaldi, crepe)
        tracks[snr] = (kaldi, crepe)
        label = 'inf' if np.isinf(snr) else f'{snr:+d}'
        print(f'{label:>8s} {stats["voiced_pct"]:9.1f} '
              f'{stats["mean_abs_cents"]:12.1f} '
              f'{stats["within_50c_pct"]:13.1f}')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        kaldi, crepe = tracks[float('inf')]
        times = np.arange(len(kaldi)) * 0.01
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(times, kaldi[:, 1], label='kaldi pitch', lw=1)
        voiced = crepe[:, 0] >= 0.5
        ax.plot(times[voiced], crepe[voiced, 1], '.', ms=3,
                label='crepe (voiced)')
        ax.set_xlabel('time (s)')
        ax.set_ylabel('F0 (Hz)')
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f'figure written to {args.plot}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
