"""In-framework ABX phone discriminability, end to end.

The reference evaluates its features with the external ABXpy stack
(``examples/features_abx/run.sh``: extract to h5features, then
abx-task / abx-score on a SLURM cluster). This example closes that
loop inside the framework: it synthesizes a small multi-speaker
phone corpus on disk, extracts MFCCs through the YAML pipeline (raw
and with per-speaker CMVN), cuts the features into phone segments
with the alignments, and scores the machine-ABX error with the
batched device DTW evaluator (:mod:`shennong_tpu.eval.abx`).

The corpus is constructed so the speakers differ by a stationary
spectral coloring — the nuisance per-speaker CMVN removes — so the
table reproduces the *direction* of the reference's published
Buckeye results (across-speaker MFCC 27.2% -> +CMVN 24.0%,
reference ``doc/source/intro_features.rst:99-117``).

Run:  python examples/abx_score.py [workdir]
"""

import os
import sys
import tempfile
import zlib

import numpy as np
import scipy.io.wavfile
import scipy.signal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

PHONES = ('aa', 'ao', 'ah')
FORMANTS = {'aa': (700, 1200), 'ao': (600, 950), 'ah': (650, 1350)}
NSPEAKERS = 4
TOKENS = 4
RATE = 16000
TOKEN_SECONDS = 0.25


def synthesize_token(phone, speaker, token):
    """One phone realization: two formant bands + speaker coloring."""
    f1, f2 = FORMANTS[phone]
    rng = np.random.RandomState(
        zlib.crc32(f'{phone}-{speaker}-{token}'.encode()))
    nsamples = int(TOKEN_SECONDS * RATE)
    excitation = rng.randn(nsamples)
    signal = np.zeros(nsamples)
    for freq in (f1, f2):
        sos = scipy.signal.butter(
            2, [freq * 0.85, freq * 1.15], 'bandpass',
            fs=RATE, output='sos')
        signal += scipy.signal.sosfilt(sos, excitation)
    srng = np.random.RandomState(1000 + speaker)
    fir = srng.randn(24) * (0.95 ** np.arange(24))
    fir[0] = 1.0
    signal = scipy.signal.lfilter(fir, [1.0], signal)
    return (signal / np.abs(signal).max() * 12000).astype(np.int16)


def build_corpus(workdir):
    """One WAV per speaker (phone tokens back to back) + alignments.

    Returns (Utterances, AlignmentCollection-compatible dict of
    per-utterance Alignment).
    """
    from shennong_tpu.alignment import Alignment
    from shennong_tpu.utterances import Utterances

    entries, alignments = [], {}
    for speaker in range(NSPEAKERS):
        pieces, times, labels = [], [], []
        cursor = 0.0
        for phone in PHONES:
            for token in range(TOKENS):
                pieces.append(synthesize_token(phone, speaker, token))
                times.append((cursor, cursor + TOKEN_SECONDS))
                labels.append(phone)
                cursor += TOKEN_SECONDS
        name = f'spk{speaker}'
        wav = os.path.join(workdir, f'{name}.wav')
        scipy.io.wavfile.write(wav, RATE, np.concatenate(pieces))
        entries.append((name, wav, name))
        alignments[name] = Alignment(
            np.asarray(times), np.asarray(labels))
    return Utterances(entries), alignments


def score(features, alignments):
    """(across, within) ABX errors of a FeaturesCollection.

    The DTW distance matrix is shared by both tasks (only the
    aggregation differs), so it is computed once.
    """
    from shennong_tpu.eval import (
        abx_error, pairwise_distances, segments_from_alignment)

    segments, phones, speakers = [], [], []
    for name, feats in features.items():
        for token, data in segments_from_alignment(
                feats, alignments[name], min_frames=2):
            segments.append(data)
            phones.append(token)
            speakers.append(name)
    distances = pairwise_distances(segments)
    return (abx_error(distances, phones, speakers, task='across'),
            abx_error(distances, phones, speakers, task='within'))


def main():
    from shennong_tpu import pipeline

    workdir = (
        sys.argv[1] if len(sys.argv) > 1
        else tempfile.mkdtemp(prefix='abx_score_'))
    os.makedirs(workdir, exist_ok=True)
    print(f'corpus: {NSPEAKERS} speakers x {len(PHONES)} phones x '
          f'{TOKENS} tokens under {workdir}')
    utterances, alignments = build_corpus(workdir)

    conditions = {}
    config = pipeline.get_default_config('mfcc')
    config['mfcc']['dither'] = 0.0
    conditions['mfcc raw'] = pipeline.extract_features(
        config, utterances)
    config = pipeline.get_default_config('mfcc', with_cmvn=True)
    config['mfcc']['dither'] = 0.0
    config['cmvn']['with_vad'] = False
    conditions['mfcc + cmvn (by speaker)'] = pipeline.extract_features(
        config, utterances)

    print()
    print(f'{"condition":<28}{"across-spk":>12}{"within-spk":>12}')
    for label, features in conditions.items():
        across, within = score(features, alignments)
        print(f'{label:<28}{across:>11.1%}{within:>11.1%}')
    print()
    print('reference direction (Buckeye, intro_features.rst): '
          'across-speaker error drops with per-speaker CMVN')


if __name__ == '__main__':
    main()
