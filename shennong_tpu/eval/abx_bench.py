"""Seeded synthetic ABX benchmark — the framework's quality anchor.

The reference's headline quality numbers are ABX phone-discrimination
errors computed by the external ABXpy stack over Buckeye/Xitsonga
corpora (``/root/reference/doc/source/intro_features.rst:99-160``);
those corpora cannot ship with a test suite. This module provides the
standing in-framework substitute: a fixed, seeded synthetic corpus
large enough that the scores are stable (±0.3 points across corpus
seeds at the ``full`` configuration), scored with the ABXpy-faithful
evaluator (:mod:`shennong_tpu.eval.abx` — DTW divergences normalized
by realized path length, speaker-pair/phone-pair aggregation).

The corpus encodes the two nuisances the reference's table isolates:

- every speaker applies a stationary spectral coloring (a fixed
  random FIR) — the nuisance **per-speaker CMVN** removes;
- every speaker scales all formants by a vocal-tract factor ``alpha``
  in [0.88, 1.14], with adjacent phones ~9% apart in formant space so
  speakers genuinely confuse phones — the nuisance **VTLN** models.

So the benchmark reproduces the *shape* of the published Buckeye
table (raw > +CMVN > VTLN+CMVN on the across-speaker task) with
magnitudes that are locked by tests and recorded in
``doc/performance.md``.
"""

import os
import shutil
import tempfile
import zlib

import numpy as np

from shennong_tpu.logger import get_logger

RATE = 16000
TOKEN_SECONDS = 0.3

#: Standard configurations. ``full`` is the recorded headline table;
#: ``ci`` is small enough for the test suite and has its own recorded
#: magnitudes.
CONFIGS = {
    'full': dict(nspeakers=20, nphones=10, tokens=4, train_tokens=3),
    'ci': dict(nspeakers=8, nphones=4, tokens=3, train_tokens=2),
}


def phone_formants(nphones):
    """Deterministic (f1, f2) grid: adjacent phones ~9% apart in f1,
    f2 ratios interleaved so no single band separates everything."""
    out = {}
    for i in range(nphones):
        f1 = 420.0 * (1.09 ** i)
        f2 = f1 * (1.55 + 0.35 * ((i * 7) % nphones) / max(nphones - 1, 1))
        out[f'p{i:02d}'] = (f1, f2)
    return out


def speaker_profiles(nspeakers):
    """Per-speaker (alpha, fir): vocal-tract scale + fixed coloring."""
    alphas = np.linspace(0.88, 1.14, nspeakers)
    profiles = {}
    for s in range(nspeakers):
        srng = np.random.RandomState(77000 + s)
        fir = srng.randn(24) * (0.95 ** np.arange(24))
        fir[0] = 1.0
        profiles[f's{s:02d}'] = (float(alphas[s]), fir)
    return profiles


def synthesize_token(formants, alpha, fir, tag, seed):
    """One phone realization: two formant bands at ``alpha``-scaled
    frequencies, through the speaker's stationary coloring.

    The formants glide ~±5% across the token (three crossfaded
    stages) and a syllable-like amplitude envelope shapes it, so the
    tokens carry temporal modulation — without it RASTA filtering
    (which suppresses stationary spectra by design) would erase all
    phone information and score at chance."""
    import scipy.signal

    f1, f2 = formants
    rng = np.random.RandomState(
        (zlib.crc32(tag.encode()) + 7919 * seed) % (2 ** 32))
    nsamples = int(TOKEN_SECONDS * RATE)
    excitation = rng.randn(nsamples)

    stages = (0.95, 1.0, 1.05)
    hop = nsamples // len(stages)
    window = np.zeros(nsamples)
    signal = np.zeros(nsamples)
    for k, glide in enumerate(stages):
        start = k * hop
        stop = nsamples if k == len(stages) - 1 else (k + 2) * hop
        piece = np.zeros(stop - start)
        for freq in (f1 * alpha * glide, f2 * alpha * glide):
            sos = scipy.signal.butter(
                2, [freq * 0.9, freq * 1.1], 'bandpass',
                fs=RATE, output='sos')
            piece += scipy.signal.sosfilt(
                sos, excitation[start:stop])
        fade = np.hanning(2 * (stop - start))[:stop - start] \
            if len(stages) > 1 else np.ones(stop - start)
        signal[start:stop] += piece * fade
        window[start:stop] += fade
    signal /= np.maximum(window, 1e-3)

    # syllable-like onset/offset envelope
    t = np.arange(nsamples) / nsamples
    signal *= np.sin(np.pi * np.clip(t * 1.15, 0, 1)) ** 0.5

    signal = scipy.signal.lfilter(fir, [1.0], signal)
    # tiny noise floor: the envelope starts at exactly zero, and with
    # dither disabled a digitally-silent frame would hit log(0)
    signal += 1e-4 * np.abs(signal).max() * rng.randn(nsamples)
    return (signal / np.abs(signal).max() * 12000).astype(np.int16)


def train_warps(workdir, phones, profiles, train_tokens, seed,
                njobs=1, log=get_logger('abx-bench', 'warning')):
    """Train VTLN warps on a held-out training half of the corpus.

    Per speaker, two utterances concatenate ``train_tokens`` fresh
    realizations of every phone (token tags disjoint from the
    evaluation set). Returns the per-speaker warp dict.
    """
    from shennong_tpu.audio import Audio
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.processor.vtln import VtlnProcessor
    from shennong_tpu.utterances import Utterances

    items = []
    for speaker, (alpha, fir) in profiles.items():
        for utt in range(2):
            parts = [
                synthesize_token(
                    f12, alpha, fir,
                    f'{phone}-{speaker}-train-{utt}-{tok}', seed)
                for phone, f12 in phones.items()
                for tok in range(train_tokens)]
            wav = os.path.join(workdir, f'{speaker}-u{utt}.wav')
            Audio(np.concatenate(parts), RATE).save(wav)
            items.append((f'{speaker}-u{utt}', wav, speaker))

    ubm_params = DiagUbmProcessor(
        num_gauss=16, num_iters=2, num_iters_init=3,
        num_frames=100000, seed=0).get_params()
    ubm_params['features']['mfcc']['dither'] = 0
    vtln = VtlnProcessor(
        num_iters=3, min_warp=0.85, max_warp=1.25, warp_step=0.025,
        subsample=2, ubm=ubm_params)
    vtln.features['mfcc']['dither'] = 0
    vtln.log.setLevel(log.getEffectiveLevel())
    return vtln.process(
        Utterances(items), group_by='speaker', njobs=njobs)


def _make_processor(feature):
    """The framework processor for a benchmark row (dither disabled:
    the benchmark is deterministic per seed)."""
    from shennong_tpu.processor import (
        FilterbankProcessor, MfccProcessor, PlpProcessor,
        SpectrogramProcessor)

    if feature == 'spectrogram':
        return SpectrogramProcessor(dither=0.0)
    if feature == 'filterbank':
        return FilterbankProcessor(dither=0.0)
    if feature == 'mfcc':
        return MfccProcessor(dither=0.0)
    if feature == 'plp':
        return PlpProcessor(dither=0.0)
    if feature == 'rastaplp':
        return PlpProcessor(dither=0.0, rasta=True)
    raise ValueError(f'unknown benchmark feature: {feature}')


#: Rows of the reference's published tables this benchmark reproduces
#: (``intro_features.rst:99-160``); spectrogram takes no VTLN warp,
#: exactly like the reference's '-' cells.
FEATURES = ('spectrogram', 'filterbank', 'mfcc', 'plp', 'rastaplp')


def benchmark(config='full', seed=0, features=('mfcc',), workdir=None,
              njobs=1, log=get_logger('abx-bench', 'warning')):
    """Run the standing ABX benchmark at a named configuration.

    Returns a dict: ``errors[task][feature][condition]`` in [0, 1]
    for task in ('across', 'within'), feature from ``features`` and
    condition in ('raw', '+cmvn', 'vtln+cmvn'; spectrogram has no
    VTLN condition), plus ``warps``, ``alphas`` and ``nsegments``.
    """
    from shennong_tpu.audio import Audio
    from shennong_tpu.eval.abx import abx_error, pairwise_distances
    from shennong_tpu.postprocessor import CmvnPostProcessor

    params = CONFIGS[config] if isinstance(config, str) else dict(config)
    phones = phone_formants(params['nphones'])
    profiles = speaker_profiles(params['nspeakers'])

    created_workdir = workdir is None
    if created_workdir:
        workdir = tempfile.mkdtemp(prefix='abx_bench_')
    log.info('training VTLN warps (%d speakers)', len(profiles))
    try:
        warps = train_warps(
            workdir, phones, profiles, params['train_tokens'], seed,
            njobs=njobs, log=log)
    finally:
        if created_workdir:
            # the training WAVs are corpus-sized; do not leak one
            # directory per run
            shutil.rmtree(workdir, ignore_errors=True)

    log.info('synthesizing evaluation tokens')
    audios, phone_labels, speaker_labels = [], [], []
    per_speaker = {}
    for phone, f12 in phones.items():
        for speaker, (alpha, fir) in profiles.items():
            for tok in range(params['tokens']):
                audios.append((speaker, Audio(synthesize_token(
                    f12, alpha, fir,
                    f'{phone}-{speaker}-eval-{tok}', seed), RATE)))
                phone_labels.append(phone)
                speaker_labels.append(speaker)
                per_speaker.setdefault(speaker, []).append(
                    len(audios) - 1)

    def cmvn_normalized(feature_list):
        out = [None] * len(feature_list)
        for speaker, indices in per_speaker.items():
            cmvn = CmvnPostProcessor(dim=feature_list[0].ndims)
            for index in indices:
                cmvn.accumulate(feature_list[index])
            for index in indices:
                out[index] = np.asarray(
                    cmvn.process(feature_list[index]).data)
        return out

    errors = {'across': {}, 'within': {}}
    for feature in features:
        proc = _make_processor(feature)
        log.info('extracting %s segments', feature)
        plain = [proc.process(audio) for _, audio in audios]
        conditions = {
            'raw': [np.asarray(f.data) for f in plain],
            '+cmvn': cmvn_normalized(plain),
        }
        if feature != 'spectrogram':
            warped = [
                proc.process(audio, vtln_warp=warps[speaker])
                for speaker, audio in audios]
            conditions['vtln+cmvn'] = cmvn_normalized(warped)

        for task in ('across', 'within'):
            errors[task][feature] = {}
        for label, segments in conditions.items():
            log.info('scoring %s %s (%d segments)',
                     feature, label, len(segments))
            # large pair batches: the full configuration scores 320k
            # pairs per condition, and each dispatch pays a fixed
            # host-device round trip
            distances = pairwise_distances(segments, batch=4096)
            for task in ('across', 'within'):
                errors[task][feature][label] = abx_error(
                    distances, phone_labels, speaker_labels, task=task)

    return {
        'errors': errors,
        'warps': dict(warps),
        'alphas': {s: a for s, (a, _) in profiles.items()},
        'nsegments': len(audios),
        'config': params,
        'seed': seed,
    }
