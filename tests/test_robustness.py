"""Robustness tests for less-traveled code paths"""

import numpy as np
import pytest

import jax.numpy as jnp

from shennong_tpu import Audio, Utterances
from shennong_tpu.processor import KaldiPitchProcessor, MfccProcessor

from tests import pitch_oracle
from tests.conftest import make_speech_like_signal


def test_noninteger_resample_ratio():
    """44.1 kHz -> 4 kHz exercises the general gather resampler."""
    from shennong_tpu.ops import resample as R

    sig = make_speech_like_signal(44100, 44100).astype(np.float64)
    ours = np.asarray(R.linear_resample(
        jnp.asarray(sig[None].astype(np.float32)), 44100,
        44100.0, 4000.0, 1000.0, 1))[0]
    ref = pitch_oracle.linear_resample(sig, 44100, 4000, 1000.0, 1)
    assert ours.shape[0] == len(ref)
    scale = np.abs(ref).max()
    assert np.max(np.abs(ours - ref)) / scale < 1e-4


def test_pitch_at_44100():
    """The pitch tracker works at non-integer decimation ratios."""
    sig = make_speech_like_signal(44100, 44100)
    audio = Audio(sig, 44100)
    pitch = KaldiPitchProcessor(sample_rate=44100).process(audio)
    assert pitch.nframes > 90
    # the synthetic F0 stays trackable
    times = pitch.times.mean(axis=1)
    expected = 120 + 30 * np.sin(2 * np.pi * 0.7 * times)
    voiced = pitch.data[:, 0] > 0.8
    assert voiced.sum() > 20
    err = np.abs(pitch.data[voiced, 1] - expected[voiced])
    assert np.median(err) < 5.0


def test_batched_snip_edges_false(wav_file):
    """The reflection (gather) framing path in batched mode."""
    utterances = Utterances([
        ('u1', wav_file, 0.0, 0.6), ('u2', wav_file, 0.6, 1.4)])
    proc = MfccProcessor(dither=0, snip_edges=False)
    batched = proc.process_all(utterances)
    for utt in utterances:
        single = proc.process(utt.load_audio())
        assert batched[utt.name].shape == single.shape
        assert np.allclose(
            batched[utt.name].data, single.data, atol=2e-4)


def test_long_utterance():
    """A 60 s utterance runs through MFCC and pitch."""
    sig = make_speech_like_signal(16000 * 60, 16000)
    audio = Audio(sig, 16000)
    mfcc = MfccProcessor(dither=0).process(audio)
    assert mfcc.nframes == 1 + (16000 * 60 - 400) // 160
    pitch = KaldiPitchProcessor().process(audio)
    assert abs(pitch.nframes - mfcc.nframes) <= 2
    assert np.all(np.isfinite(mfcc.data))
    assert np.all(np.isfinite(pitch.data))


def test_short_utterance():
    """A signal shorter than one frame yields empty features."""
    audio = Audio(np.zeros(100, dtype=np.int16), 16000)
    mfcc = MfccProcessor(dither=0).process(audio)
    assert mfcc.shape == (0, 13)
    pitch = KaldiPitchProcessor().process(audio)
    assert pitch.shape == (0, 2)


def test_odd_frame_geometry(audio):
    """Window not an integer multiple of the shift, shift > window."""
    odd = MfccProcessor(
        dither=0, frame_shift=0.007, frame_length=0.031)
    out = odd.process(audio)
    assert out.nframes > 0

    gappy = MfccProcessor(
        dither=0, frame_shift=0.05, frame_length=0.02)
    out = gappy.process(audio)
    assert out.nframes == 1 + (22713 - 320) // 800


def test_bucket_policy_bounds_compiles(tmpdir):
    """Processing many distinct utterance lengths must reuse a small
    set of compiled programs (geometric length buckets)."""
    import scipy.io.wavfile

    from shennong_tpu import Utterances
    from shennong_tpu.ops.framing import bucket_size
    from shennong_tpu.ops.spectral import mfcc_batch
    from shennong_tpu.processor import MfccProcessor

    rng = np.random.RandomState(0)
    path = str(tmpdir.join('long.wav'))
    scipy.io.wavfile.write(
        path, 16000, (rng.randn(16000 * 30) * 5000).astype(np.int16))

    # 20 random lengths between 0.5 and 25 s
    durations = rng.uniform(0.5, 25.0, 20)
    utterances = Utterances([
        (f'u{i}', path, 0.0, float(round(d, 3)))
        for i, d in enumerate(durations)])

    before = mfcc_batch._cache_size()
    proc = MfccProcessor(dither=0)
    for utt in utterances:
        proc.process(utt.load_audio())
    compiles = mfcc_batch._cache_size() - before

    buckets = {
        bucket_size(int(16000 * round(d, 3))) for d in durations}
    assert compiles <= len(buckets)
    # geometric buckets: far fewer programs than utterances
    assert compiles <= 12, compiles
