"""Golden regression tests: every processor must keep producing the
committed outputs (oracle-verified at freeze time) on the standard
synthetic test signal. Guards against silent numeric drift."""

import os

import numpy as np
import pytest

from shennong_tpu.processor import (
    EnergyProcessor, FilterbankProcessor, KaldiPitchProcessor,
    MfccProcessor, PlpProcessor, SpectrogramProcessor)
from shennong_tpu.processor.pitch_kaldi import KaldiPitchPostProcessor

GOLDEN = os.path.join(os.path.dirname(__file__), 'data', 'golden.npz')


@pytest.fixture(scope='module')
def golden():
    with np.load(GOLDEN) as data:
        return {k: data[k] for k in data.files}


def test_spectral_golden(audio, golden):
    cases = {
        'mfcc': MfccProcessor(dither=0),
        'fbank': FilterbankProcessor(dither=0),
        'spectrogram': SpectrogramProcessor(dither=0),
        'plp': PlpProcessor(dither=0),
        'rastaplp': PlpProcessor(dither=0, rasta=True),
        'energy': EnergyProcessor(dither=0),
    }
    for name, proc in cases.items():
        out = proc.process(audio).data
        assert out.shape == golden[name].shape, name
        assert np.max(np.abs(out - golden[name])) < 1e-3, name


def test_pitch_golden(audio, golden):
    pitch = KaldiPitchProcessor().process(audio)
    assert pitch.shape == golden['pitch'].shape
    assert np.max(np.abs(pitch.data - golden['pitch'])) < 1e-3

    post = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0).process(pitch)
    assert post.shape == golden['pitch_post'].shape
    assert np.max(np.abs(post.data - golden['pitch_post'])) < 1e-3
