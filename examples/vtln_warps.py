#!/usr/bin/env python
"""Train per-speaker VTLN warps and extract warped features.

The TPU-native counterpart of the reference's examples/vtln_training
SLURM recipe: the UBM-GMM EM, the 41 per-warp feature re-extractions
and the LVTLN estimation all run as batched device programs.

Usage:
    python vtln_warps.py <utterances.txt> <warps.yaml> [<features.h5f>]

The utterances file must carry speaker information, e.g.:
    utt1 /data/speech/utt1.wav speaker1
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse

from shennong_tpu import Utterances
from shennong_tpu.logger import get_logger
from shennong_tpu.pipeline import extract_features, get_default_config
from shennong_tpu.processor import VtlnProcessor


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('utterances')
    parser.add_argument('warps_output')
    parser.add_argument('features_output', nargs='?')
    parser.add_argument(
        '--duration', type=float, default=300.0,
        help='seconds of audio per speaker used for training')
    args = parser.parse_args()

    log = get_logger('vtln', 'info')
    utterances = Utterances.load(args.utterances)

    # bound the training data per speaker (like the reference recipe)
    training = utterances.fit_to_duration(
        args.duration, truncate=True, shuffle=False)

    vtln = VtlnProcessor()
    vtln.set_logger('info')
    # one warp per speaker when speakers are known, as in the
    # reference recipe (examples/simple/mfcc_vtln.py:104)
    group_by = 'speaker' if training.has_speakers() else 'utterance'
    warps = vtln.process(training, group_by=group_by)
    vtln.save_warps(args.warps_output)
    log.info('saved %s warps to %s', len(warps), args.warps_output)

    if args.features_output:
        config = get_default_config(
            'mfcc', with_cmvn=True, with_delta=True)
        features = extract_features(
            config, utterances, warps=warps, log=log)
        features.save(args.features_output)
        log.info('saved warped features to %s', args.features_output)


if __name__ == '__main__':
    main()
