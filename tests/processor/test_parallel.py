"""Tests for the batched executor: batched == sequential results"""

import numpy as np
import pytest

from shennong_tpu import Utterances
from shennong_tpu.parallel import BatchExecutor, data_mesh
from shennong_tpu.processor import (
    EnergyProcessor, FilterbankProcessor, KaldiPitchProcessor,
    MfccProcessor, PlpProcessor, SpectrogramProcessor)


@pytest.fixture(scope='module')
def utterances(wav_file):
    return Utterances([
        ('u1', wav_file, 'spk1', 0.0, 0.4),
        ('u2', wav_file, 'spk1', 0.4, 1.0),
        ('u3', wav_file, 'spk2', 1.0, 1.4),
        ('u4', wav_file, 'spk2', 0.1, 1.3)])


@pytest.mark.parametrize('cls', [
    MfccProcessor, FilterbankProcessor, SpectrogramProcessor,
    PlpProcessor, EnergyProcessor])
def test_batched_equals_sequential(utterances, cls):
    proc = cls(dither=0)
    batched = proc.process_all(utterances)

    for utt in utterances:
        single = proc.process(utt.load_audio())
        assert batched[utt.name].shape == single.shape
        assert np.allclose(
            batched[utt.name].data, single.data, atol=2e-4), cls


def test_pitch_batched_equals_sequential(utterances):
    proc = KaldiPitchProcessor()
    batched = proc.process_all(utterances)
    for utt in utterances:
        single = proc.process(utt.load_audio())
        assert batched[utt.name].shape == single.shape
        assert np.allclose(
            batched[utt.name].data, single.data, atol=1e-4)


def test_vtln_warps_batched(utterances):
    proc = MfccProcessor(dither=0)
    warps = {'u1': 0.9, 'u2': 1.0, 'u3': 1.1, 'u4': 1.05}
    batched = proc.process_all(utterances, vtln_warp=warps)
    for utt in utterances:
        single = proc.process(utt.load_audio(), vtln_warp=warps[utt.name])
        assert np.allclose(
            batched[utt.name].data, single.data, atol=2e-4)
        assert batched[utt.name].properties['mfcc']['vtln_warp'] == \
            warps[utt.name]


def test_kwargs_validation(utterances):
    proc = MfccProcessor(dither=0)
    with pytest.raises(ValueError, match='is not a dict'):
        proc.process_all(utterances, vtln_warp=1.0)
    with pytest.raises(ValueError, match='different names'):
        proc.process_all(utterances, vtln_warp={'u1': 1.0})


def test_njobs_values(utterances):
    proc = MfccProcessor(dither=0)
    out1 = proc.process_all(utterances, njobs=1)
    out2 = proc.process_all(utterances, njobs=2)
    assert out1.is_close(out2)
    with pytest.raises(ValueError, match='strictly positive'):
        proc.process_all(utterances, njobs=0)


def test_sharded_mesh(utterances):
    """Data-parallel extraction over the 8-device CPU mesh matches the
    unsharded result."""
    import jax
    mesh = data_mesh(jax.devices())
    assert mesh.devices.size == 8

    proc = MfccProcessor(dither=0)
    sharded = BatchExecutor(proc, mesh=mesh).process_all(utterances)
    plain = BatchExecutor(proc).process_all(utterances)
    assert sharded.is_close(plain, atol=2e-4)


def test_sample_rate_checked(utterances):
    proc = MfccProcessor(sample_rate=8000, dither=0)
    with pytest.raises(ValueError, match='mismatch in sample rates'):
        proc.process_all(utterances)


def test_default_mesh_pipeline(utterances):
    """extract_features shards over an installed default mesh."""
    import jax
    from shennong_tpu.parallel import set_default_mesh
    from shennong_tpu.pipeline import extract_features, get_default_config

    config = get_default_config('mfcc')
    config['mfcc']['dither'] = 0

    plain = extract_features(config, utterances)
    set_default_mesh(data_mesh(jax.devices()))
    try:
        sharded = extract_features(config, utterances)
    finally:
        set_default_mesh(None)
    assert sharded.is_close(plain, atol=2e-4)
