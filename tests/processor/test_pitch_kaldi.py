"""Tests for the Kaldi pitch processor and post-processor"""

import numpy as np
import pytest

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
    ours = KaldiPitchProcessor().process(audio).data
    ref = pitch_oracle.compute_pitch(audio.data.astype(np.float64))
    assert ours.shape == ref.shape
    # lag decisions must agree except at frames where the Viterbi
    # costs tie within float32 (unvoiced regions); there the choice
    # may differ by one geometric lag step
    same_lag = np.isclose(ours[:, 1], ref[:, 1], rtol=1e-3)
    assert same_lag.mean() > 0.94
    one_step = np.log(1.005) * 1.5
    assert np.max(np.abs(np.log(ours[:, 1] / ref[:, 1]))) < one_step
    assert np.max(np.abs(ours[same_lag, 0] - ref[same_lag, 0])) < 1e-3
    assert np.max(np.abs(ours[same_lag, 1] - ref[same_lag, 1])
                  / ref[same_lag, 1]) < 1e-3


def test_oracle_parity_options(audio):
    kwargs = dict(min_f0=60, max_f0=300, penalty_factor=0.3,
                  nccf_ballast=1000)
    ours = KaldiPitchProcessor(**kwargs).process(audio).data
    ref = pitch_oracle.compute_pitch(
        audio.data.astype(np.float64), **kwargs)
    assert ours.shape == ref.shape
    same_lag = np.isclose(ours[:, 1], ref[:, 1], rtol=1e-3)
    assert same_lag.mean() > 0.94


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


def test_post_noise(raw_pitch):
    post = KaldiPitchPostProcessor()
    out1 = post.process(raw_pitch).data
    out2 = post.process(raw_pitch).data
    # delta pitch column gets fresh noise each run
    assert not np.array_equal(out1[:, 2], out2[:, 2])
    # other columns are deterministic
    assert np.array_equal(out1[:, :2], out2[:, :2])
