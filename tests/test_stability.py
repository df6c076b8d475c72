"""Determinism harness: every processor run twice gives identical
output (same instance and fresh instance, dither disabled), modeled on
the reference's stability suite."""

import numpy as np
import pytest

from shennong_tpu.postprocessor import (
    CmvnPostProcessor, DeltaPostProcessor,
    SlidingWindowCmvnPostProcessor, VadPostProcessor)
from shennong_tpu.processor import (
    EnergyProcessor, FilterbankProcessor, KaldiPitchProcessor,
    MfccProcessor, PlpProcessor, SpectrogramProcessor)

PROCESSORS = [
    (MfccProcessor, dict(dither=0)),
    (FilterbankProcessor, dict(dither=0)),
    (SpectrogramProcessor, dict(dither=0)),
    (PlpProcessor, dict(dither=0)),
    (PlpProcessor, dict(dither=0, rasta=True)),
    (EnergyProcessor, dict(dither=0)),
    (KaldiPitchProcessor, dict()),
]


@pytest.mark.parametrize(
    'cls,kwargs', PROCESSORS,
    ids=lambda p: getattr(p, '__name__', str(p)))
def test_processor_stability(audio, cls, kwargs):
    proc = cls(**kwargs)
    first = proc.process(audio)
    second = proc.process(audio)
    assert np.array_equal(first.data, second.data)

    fresh = cls(**kwargs).process(audio)
    assert np.array_equal(first.data, fresh.data)


POSTPROCESSORS = [
    (DeltaPostProcessor, dict()),
    (SlidingWindowCmvnPostProcessor, dict()),
    (VadPostProcessor, dict()),
]


@pytest.mark.parametrize(
    'cls,kwargs', POSTPROCESSORS,
    ids=lambda p: getattr(p, '__name__', str(p)))
def test_postprocessor_stability(mfcc, cls, kwargs):
    proc = cls(**kwargs)
    first = proc.process(mfcc)
    second = proc.process(mfcc)
    assert np.array_equal(first.data, second.data)

    fresh = cls(**kwargs).process(mfcc)
    assert np.array_equal(first.data, fresh.data)


def test_cmvn_stability(mfcc):
    proc1 = CmvnPostProcessor(mfcc.ndims)
    proc1.accumulate(mfcc)
    proc2 = CmvnPostProcessor(mfcc.ndims)
    proc2.accumulate(mfcc)
    assert np.array_equal(
        proc1.process(mfcc).data, proc2.process(mfcc).data)


def test_batched_stability(audio, wav_file):
    """Batched extraction is deterministic too."""
    from shennong_tpu import Utterances
    utts = Utterances(
        [('u1', wav_file, 0.0, 0.8), ('u2', wav_file, 0.8, 1.4)])
    proc = MfccProcessor(dither=0)
    first = proc.process_all(utts)
    second = proc.process_all(utts)
    for key in first:
        assert np.array_equal(first[key].data, second[key].data)
