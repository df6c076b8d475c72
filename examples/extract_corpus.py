#!/usr/bin/env python
"""Extract features for a whole corpus on TPU.

The TPU-native counterpart of the reference's SLURM fan-out scripts
(examples/features_abx in bootphon/shennong): instead of splitting the
utterance list into cluster jobs, the collection is processed as
padded batches sharded over the local device mesh.

Usage:
    python extract_corpus.py <utterances.txt> <output.h5f> \
        [--features mfcc] [--pitch] [--cmvn] [--delta] [--batch 64]

The utterances file uses the standard index format, e.g.:
    utt1 /data/speech/utt1.wav speaker1
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

from shennong_tpu import Utterances
from shennong_tpu.logger import get_logger
from shennong_tpu.pipeline import extract_features, get_default_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('utterances')
    parser.add_argument('output')
    parser.add_argument('--features', default='mfcc',
                        choices=['mfcc', 'filterbank', 'plp',
                                 'spectrogram', 'bottleneck'])
    parser.add_argument('--pitch', action='store_true')
    parser.add_argument('--cmvn', action='store_true')
    parser.add_argument('--delta', action='store_true')
    args = parser.parse_args()

    log = get_logger('extract', 'info')
    config = get_default_config(
        args.features,
        with_pitch='kaldi' if args.pitch else False,
        with_cmvn=args.cmvn,
        with_delta=args.delta)

    utterances = Utterances.load(args.utterances)
    log.info('%s utterances, %.1f hours of audio',
             len(utterances), utterances.duration() / 3600)

    start = time.perf_counter()
    features = extract_features(config, utterances, log=log)
    elapsed = time.perf_counter() - start
    log.info('extracted in %.1fs (%.0fx real-time)',
             elapsed, utterances.duration() / elapsed)

    features.save(args.output)
    log.info('saved to %s', args.output)


if __name__ == '__main__':
    main()
