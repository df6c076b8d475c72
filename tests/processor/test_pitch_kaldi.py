"""Tests for the Kaldi pitch processor and post-processor"""

import numpy as np
import pytest

from shennong_tpu.audio import Audio
from shennong_tpu.processor.pitch_kaldi import (
    KaldiPitchProcessor, KaldiPitchPostProcessor)

from tests import pitch_oracle


@pytest.fixture(scope='module')
def raw_pitch(audio):
    return KaldiPitchProcessor().process(audio)


def test_shape_anchor(audio, raw_pitch):
    assert raw_pitch.shape == (140, 2)
    assert raw_pitch.times.shape == (140, 2)


def test_pitch_in_range(raw_pitch):
    proc = KaldiPitchProcessor()
    assert np.all(raw_pitch.data[:, 1] >= proc.min_f0)
    assert np.all(raw_pitch.data[:, 1] <= proc.max_f0)
    assert np.all(raw_pitch.data[:, 0] >= -1.01)
    assert np.all(raw_pitch.data[:, 0] <= 1.01)


def test_tracks_f0(audio, raw_pitch):
    """The synthetic test signal has F0 = 120 + 30 sin(2 pi 0.7 t);
    on voiced (high NCCF) frames the tracker must follow it."""
    times = raw_pitch.times.mean(axis=1)
    expected = 120 + 30 * np.sin(2 * np.pi * 0.7 * times)
    voiced = raw_pitch.data[:, 0] > 0.8
    assert voiced.sum() > 30
    err = np.abs(raw_pitch.data[voiced, 1] - expected[voiced])
    assert np.median(err) < 5.0  # Hz


def test_oracle_parity(audio):
    """Every lag decision matches the float64 oracle or is a proven
    numerical tie — no unexplained disagreement allowed (same contract
    as tests/test_fuzz_parity.py)."""
    signal = audio.data.astype(np.float64)
    ours = KaldiPitchProcessor().process(audio).data
    ref = pitch_oracle.compute_pitch(signal)
    same = pitch_oracle.assert_lag_decisions(signal, ours, ref)
    assert np.max(np.abs(ours[same, 1] - ref[same, 1])
                  / ref[same, 1]) < 1e-3


def test_oracle_parity_options(audio):
    kwargs = dict(min_f0=60, max_f0=300, penalty_factor=0.3,
                  nccf_ballast=1000)
    signal = audio.data.astype(np.float64)
    ours = KaldiPitchProcessor(**kwargs).process(audio).data
    ref = pitch_oracle.compute_pitch(signal, **kwargs)
    pitch_oracle.assert_lag_decisions(signal, ours, ref, **kwargs)


def test_signal_checks(audio):
    proc = KaldiPitchProcessor(sample_rate=8000)
    with pytest.raises(ValueError, match='mismatch in sample rates'):
        proc.process(audio)


def test_params():
    proc = KaldiPitchProcessor()
    assert len(proc.get_params()) == 13
    post = KaldiPitchPostProcessor()
    assert len(post.get_params()) == 13
    assert post.ndims == 3


# ------------------------------------------------------------------- post

def test_post_shape(raw_pitch):
    post = KaldiPitchPostProcessor()
    out = post.process(raw_pitch)
    assert out.shape == (140, 3)

    post.add_raw_log_pitch = True
    assert post.process(raw_pitch).shape == (140, 4)

    post = KaldiPitchPostProcessor(
        add_pov_feature=False, add_normalized_log_pitch=False,
        add_delta_pitch=False, add_raw_log_pitch=True)
    assert post.process(raw_pitch).shape == (140, 1)


def test_post_no_feature_selected(raw_pitch):
    post = KaldiPitchPostProcessor(
        add_pov_feature=False, add_normalized_log_pitch=False,
        add_delta_pitch=False, add_raw_log_pitch=False)
    with pytest.raises(ValueError, match='at least one'):
        post.process(raw_pitch)


def test_post_bad_input(mfcc):
    with pytest.raises(ValueError, match='shape must be'):
        KaldiPitchPostProcessor().process(mfcc)


def test_post_oracle(raw_pitch):
    post = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0, add_raw_log_pitch=True)
    ours = post.process(raw_pitch).data
    ref = pitch_oracle.process_pitch(
        raw_pitch.data.astype(np.float64), add_raw=True)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_post_oracle_delay(raw_pitch):
    post = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0, delay=3)
    ours = post.process(raw_pitch).data
    ref = pitch_oracle.process_pitch(
        raw_pitch.data.astype(np.float64), delay=3)
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_post_collection_equals_single(audio, raw_pitch):
    """The bucket-batched collection path reproduces the per-utterance
    post-processor output exactly (noise disabled)."""
    from shennong_tpu import FeaturesCollection
    from shennong_tpu.processor.pitch_kaldi import KaldiPitchProcessor

    # a second utterance with a different frame count exercises the
    # ragged bucketing
    short = Audio(audio.data[:12000], audio.sample_rate)
    raw_short = KaldiPitchProcessor().process(short)
    collection = FeaturesCollection(utt1=raw_pitch, utt2=raw_short)

    post = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0, add_raw_log_pitch=True)
    batched = post.process_collection(collection)
    for name, raw in collection.items():
        single = post.process(raw)
        assert batched[name].shape == single.shape
        np.testing.assert_array_equal(batched[name].data, single.data)
        np.testing.assert_array_equal(batched[name].times, single.times)
        assert batched[name].properties == single.properties


def test_post_collection_validation(raw_pitch, mfcc):
    from shennong_tpu import FeaturesCollection
    post = KaldiPitchPostProcessor(
        add_pov_feature=False, add_normalized_log_pitch=False,
        add_delta_pitch=False, add_raw_log_pitch=False)
    with pytest.raises(ValueError, match='at least one'):
        post.process_collection(FeaturesCollection(utt=raw_pitch))
    with pytest.raises(ValueError, match='shape must be'):
        KaldiPitchPostProcessor().process_collection(
            FeaturesCollection(utt=mfcc))


def test_post_collection_noise(raw_pitch):
    """The batched path still draws fresh delta noise per run."""
    from shennong_tpu import FeaturesCollection
    collection = FeaturesCollection(utt=raw_pitch)
    post = KaldiPitchPostProcessor()
    out1 = post.process_collection(collection)['utt'].data
    out2 = post.process_collection(collection)['utt'].data
    assert not np.array_equal(out1[:, 2], out2[:, 2])
    assert np.array_equal(out1[:, :2], out2[:, :2])


def test_post_noise(raw_pitch):
    post = KaldiPitchPostProcessor()
    out1 = post.process(raw_pitch).data
    out2 = post.process(raw_pitch).data
    # delta pitch column gets fresh noise each run
    assert not np.array_equal(out1[:, 2], out2[:, 2])
    # other columns are deterministic
    assert np.array_equal(out1[:, :2], out2[:, :2])


def _long_audio(seconds=30, rate=16000):
    rng = np.random.RandomState(1)
    t = np.arange(int(rate * seconds)) / rate
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / rate
    sig = sum((0.6 ** k) * np.sin((k + 1) * phase) for k in range(5))
    sig = (sig * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2)
           + 0.02 * rng.randn(len(t)))
    return Audio((sig / np.abs(sig).max() * 0.7).astype(np.float32),
                 rate)


def test_chunked_equals_whole():
    # 5 chunks with 200-frame halos reproduce the whole-utterance
    # program bit-for-bit (Viterbi paths coalesce inside the halo and
    # the chunked resample is exact)
    audio = _long_audio(30)
    proc = KaldiPitchProcessor()
    whole = proc.process(audio)
    chunked = proc.process_chunked(
        audio, chunk_frames=700, halo_frames=200)
    assert chunked.shape == whole.shape
    np.testing.assert_array_equal(chunked.data, whole.data)
    np.testing.assert_array_equal(chunked.times, whole.times)


def test_chunked_auto_routing():
    audio = _long_audio(12)
    proc = KaldiPitchProcessor()
    whole = proc.process(audio)
    try:
        # a low threshold re-enters process() through the chunked path
        proc.AUTO_CHUNK_FRAMES = 400
        routed = proc.process(audio)
    finally:
        proc.AUTO_CHUNK_FRAMES = KaldiPitchProcessor.AUTO_CHUNK_FRAMES
    assert routed.shape == whole.shape
    np.testing.assert_array_equal(routed.data, whole.data)


def test_chunked_validation():
    audio = _long_audio(2)
    proc = KaldiPitchProcessor()
    with pytest.raises(ValueError, match='chunk_frames'):
        proc.process_chunked(audio, chunk_frames=0)
    with pytest.raises(ValueError, match='halo_frames'):
        proc.process_chunked(audio, halo_frames=-1)
    with pytest.raises(ValueError, match='sample rates'):
        proc.process_chunked(
            Audio(audio.data, audio.sample_rate, validate=False)
            .resample(8000))


def test_chunked_resample_exact():
    from shennong_tpu.ops import resample
    rng = np.random.RandomState(3)
    # integer decimation ratio (the pitch tracker's case): bit-exact
    # against the jitted whole-signal resample (the path the pitch
    # program uses; eager CPU execution rounds differently without
    # FMA fusion); arbitrary ratio: the per-chunk filter weights are
    # evaluated at different absolute times, so identity holds to
    # float rounding
    for rate_in, rate_out, atol in (
            (16000, 4000, 0.0), (44100, 4000, 1e-6)):
        sig = rng.randn(rate_in * 4).astype(np.float32)
        whole = np.asarray(resample._linear_resample_jit(
            sig[None], sig.shape[0], rate_in, rate_out, 1000.0, 1)[0])
        chunked = resample.linear_resample_chunked(
            sig, rate_in, rate_out, 1000.0, 1,
            chunk_samples=rate_in // 3)
        assert chunked.shape == whole.shape
        if atol == 0.0:
            np.testing.assert_array_equal(chunked, whole)
        else:
            np.testing.assert_allclose(chunked, whole, atol=atol)


@pytest.mark.parametrize('options', [
    dict(min_f0=60, max_f0=300),
    dict(resample_freq=3000, lowpass_cutoff=800),
    dict(frame_shift=0.02, frame_length=0.04),
])
def test_chunked_equals_whole_options(options):
    # the chunked path must reproduce the whole-utterance program for
    # non-default geometries too (different lag grids, analysis rates
    # and frame shapes)
    audio = _long_audio(12)
    proc = KaldiPitchProcessor(**options)
    whole = proc.process(audio)
    chunked = proc.process_chunked(
        audio, chunk_frames=300, halo_frames=150)
    assert chunked.shape == whole.shape
    np.testing.assert_array_equal(chunked.data, whole.data)
