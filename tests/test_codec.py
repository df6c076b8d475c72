"""Tests for the native compressed-audio codec runtime.

Mirrors the reference's format coverage (`test/test_audio.py:13`
parametrizes '.wav', '.flac', '.mp3' through scan/load/save) on the
same vendored recordings, driven through our in-process libav* codec
(`native/shennong_codec.cpp`) instead of the reference's
ffmpeg-binary subprocess (`shennong/audio.py:276-281`).
"""

import os

import numpy as np
import pytest

from shennong_tpu import native
from shennong_tpu.audio import Audio

pytestmark = pytest.mark.skipif(
    not native.codec_available(),
    reason='native codec library not built (libav* missing)')


def test_scan_mp3(real_data_path, real_audio):
    # the reference accepts approximate metadata on mp3
    # (test/test_audio.py:23-24): rate and channels are exact, the
    # sample count is the container-duration estimate
    meta = Audio.scan(os.path.join(real_data_path, 'test.mp3'))
    assert meta.sample_rate == real_audio.sample_rate == 16000
    assert meta.nchannels == real_audio.nchannels == 1
    assert meta.nsamples >= real_audio.nsamples
    assert meta.duration == pytest.approx(real_audio.duration, abs=0.2)


def test_load_mp3(real_data_path, real_audio):
    # same assertions as the reference (test/test_audio.py:44-51):
    # exact shape/dtype/rate, approximate samples (lossy codec)
    audio2 = Audio.load(os.path.join(real_data_path, 'test.mp3'))
    assert audio2.sample_rate == real_audio.sample_rate == 16000
    assert audio2.nchannels == real_audio.nchannels == 1
    assert audio2.duration == pytest.approx(1.419, rel=1e-3)
    assert audio2.data.shape == real_audio.data.shape == (22713,)
    assert audio2.dtype == real_audio.dtype == np.int16
    assert audio2.precision == real_audio.precision == 16
    assert audio2.data == pytest.approx(real_audio.data, abs=1e4)
    # and much tighter than the reference's 1e4 bound: the decoded
    # waveform correlates > 0.99 with the lossless original
    corr = np.corrcoef(
        real_audio.data.astype(np.float64),
        audio2.data.astype(np.float64))[0, 1]
    assert corr > 0.99


@pytest.mark.parametrize('ext', ['mp3', 'flac', 'ogg'])
def test_save_roundtrip(tmpdir, real_audio, ext):
    # reference save/load round-trip contract (test/test_audio.py:84-90)
    path = str(tmpdir.join('copy.' + ext))
    real_audio.save(path)
    assert os.path.isfile(path)

    audio2 = Audio.load(path)
    assert real_audio.sample_rate == audio2.sample_rate
    assert real_audio.shape == audio2.shape
    assert real_audio.dtype == audio2.dtype
    if ext == 'flac':
        # lossless: bit-exact
        assert np.array_equal(real_audio.data, audio2.data)
    else:
        corr = np.corrcoef(
            real_audio.data.astype(np.float64),
            audio2.data.astype(np.float64))[0, 1]
        assert corr > 0.99


def test_save_stereo_flac(tmpdir, real_audio):
    stereo = Audio(
        np.stack([real_audio.data, -real_audio.data], axis=1),
        real_audio.sample_rate)
    path = str(tmpdir.join('stereo.flac'))
    stereo.save(path)
    audio2 = Audio.load(path)
    assert audio2.nchannels == 2
    assert np.array_equal(audio2.data, stereo.data)


def test_codec_scan_decode_agree(real_data_path):
    # the low-level API: scan's estimate bounds decode's exact count
    path = os.path.join(real_data_path, 'test.mp3')
    channels, rate, estimate = native.codec_scan(path)
    data, rate2 = native.codec_decode(path)
    assert (channels, rate) == (1, 16000)
    assert rate2 == rate
    assert data.ndim == 1
    assert 0 < data.shape[0] <= estimate


def test_codec_decode_flac_matches_native(real_data_path):
    # both decoders (our FLAC and libav) must agree bit-for-bit
    path = os.path.join(real_data_path, 'test.flac')
    ours, rate_ours = native.flac_decode(path)
    libav, rate_libav = native.codec_decode(path)
    assert rate_ours == rate_libav
    assert np.array_equal(ours, libav)


def test_codec_bad_files(tmpdir):
    assert native.codec_decode('/does/not/exist.mp3') is None
    assert native.codec_scan('/does/not/exist.mp3') is None
    garbage = str(tmpdir.join('garbage.mp3'))
    with open(garbage, 'wb') as fp:
        fp.write(b'this is not audio at all' * 10)
    assert native.codec_scan(garbage) is None

    # unwritable encode target fails cleanly
    assert not native.codec_encode(
        '/no/such/dir/out.mp3', np.zeros(100, dtype=np.int16), 16000)


def test_flac_pipeline_equals_wav(real_data_path, tmpdir):
    """FLAC is lossless: the extraction pipeline must produce
    bit-identical features from test.flac and test.wav."""
    import os

    from shennong_tpu import Utterances
    from shennong_tpu.pipeline import extract_features, get_default_config

    utterances = Utterances([
        ('as_wav', os.path.join(real_data_path, 'test.wav')),
        ('as_flac', os.path.join(real_data_path, 'test.flac'))])
    config = get_default_config('mfcc')
    config['mfcc']['dither'] = 0
    features = extract_features(config, utterances)
    assert np.array_equal(
        features['as_wav'].data, features['as_flac'].data)
    assert np.array_equal(
        features['as_wav'].times, features['as_flac'].times)
