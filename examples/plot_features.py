#!/usr/bin/env python
"""Extract every main feature type from a wav file and plot them.

The TPU-native counterpart of the reference's
examples/simple/features_plot.py: one figure with the waveform and
the spectrogram / filterbank / MFCC / PLP (and, when its weights are
installed, bottleneck) feature matrices of the same recording.

Usage: python plot_features.py <wav> [-o figure.png]
"""

import argparse
import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from shennong_tpu.audio import Audio
from shennong_tpu.processor import (
    BottleneckProcessor, FilterbankProcessor, MfccProcessor,
    PlpProcessor, SpectrogramProcessor)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        'wav', nargs='?',
        default=os.path.join(
            os.path.dirname(__file__), os.pardir,
            'tests', 'data', 'test.wav'))
    parser.add_argument(
        '-o', '--output-file',
        help='output image; display on screen when not specified')
    args = parser.parse_args()

    audio = Audio.load(args.wav).channel(0)

    processors = {
        'spectrogram': SpectrogramProcessor(
            sample_rate=audio.sample_rate),
        'filterbank': FilterbankProcessor(sample_rate=audio.sample_rate),
        'mfcc': MfccProcessor(sample_rate=audio.sample_rate),
        'plp': PlpProcessor(sample_rate=audio.sample_rate)}
    try:
        processors['bottleneck'] = BottleneckProcessor()
    except Exception as why:  # weights not installed
        print(f'skipping bottleneck: {why}')

    features = {}
    for name, proc in sorted(processors.items()):
        print(f'extracting {name}...')
        try:
            features[name] = proc.process(audio)
        except Exception as why:
            print(f'skipping {name}: {why}')

    import matplotlib
    if args.output_file:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        len(features) + 1, 1, figsize=(10, 2.2 * (len(features) + 1)),
        sharex=True)
    time = np.arange(audio.nsamples) / audio.sample_rate
    axes[0].plot(time, audio.astype(np.float32).data, lw=0.4)
    axes[0].set_ylabel('waveform')

    for axis, (name, feats) in zip(axes[1:], sorted(features.items())):
        axis.imshow(
            feats.data.T, origin='lower', aspect='auto',
            interpolation='nearest',
            extent=(0, audio.duration, 0, feats.ndims))
        axis.set_ylabel(name)
    axes[-1].set_xlabel('time (s)')
    fig.tight_layout()

    if args.output_file:
        fig.savefig(args.output_file, dpi=120)
        print(f'figure written to {args.output_file}')
    else:  # pragma: nocover
        plt.show()
    return 0


if __name__ == '__main__':
    sys.exit(main())
