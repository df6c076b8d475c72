"""Multi-device / multi-host extraction must equal single-device.

SURVEY §4 item (c): padding, sharding and host partitioning are pure
execution-strategy choices — they must never change the features. The
conftest forces an 8-virtual-device CPU platform, so these tests
exercise the real mesh code paths hermetically.
"""

import warnings

import jax
import numpy as np
import pytest

from shennong_tpu import Utterances
from shennong_tpu.parallel import data_mesh, set_default_mesh
from shennong_tpu.parallel.distributed import shard_utterances
from shennong_tpu.pipeline import extract_features, get_default_config


@pytest.fixture(scope='module')
def corpus(wav_file):
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        return Utterances([
            ('u%d' % i, wav_file, 'spk%d' % (i % 2),
             0.05 * i, 0.6 + 0.08 * i)
            for i in range(6)])


@pytest.fixture(scope='module')
def full_config():
    config = get_default_config(
        'mfcc', with_cmvn=True, with_delta=True, with_pitch='kaldi')
    config['mfcc']['dither'] = 0
    config['pitch']['postprocessing']['delta_pitch_noise_stddev'] = 0
    return config


def test_full_pipeline_mesh_equals_single(corpus, full_config):
    """The complete cmvn+delta+pitch pipeline on an 8-device mesh
    produces the same collection as unsharded execution."""
    assert len(jax.devices()) == 8

    plain = extract_features(full_config, corpus)
    set_default_mesh(data_mesh(jax.devices()))
    try:
        sharded = extract_features(full_config, corpus)
    finally:
        set_default_mesh(None)

    assert sorted(sharded.keys()) == sorted(plain.keys())
    for name in plain:
        assert sharded[name].shape == plain[name].shape, name
        # spectral/delta/cmvn columns: tight; the pitch columns go
        # through a Viterbi argmin that could flip on exact float ties
        assert np.allclose(
            sharded[name].data, plain[name].data, atol=2e-4), name
    assert sharded.is_close(plain, atol=2e-4)


def test_two_host_shards_equal_single(corpus, full_config):
    """Round-robin host sharding (the multi-host corpus split of
    parallel.distributed) composed back together equals the
    single-process run. Speakers alternate in the corpus, so each
    simulated host owns whole speakers and the per-speaker CMVN
    statistics are host-local, exactly like the reference's
    per-speaker cluster recipes."""
    single = extract_features(full_config, corpus)

    merged = {}
    for process in range(2):
        shard = shard_utterances(
            corpus, process_index=process, process_count=2)
        speakers = set(utt.speaker for utt in shard)
        assert len(speakers) == 1  # whole speakers per host
        part = extract_features(full_config, shard)
        merged.update(part.items())

    assert sorted(merged.keys()) == sorted(single.keys())
    for name in single:
        assert merged[name].shape == single[name].shape
        assert np.allclose(
            merged[name].data, single[name].data, atol=2e-4), name


def test_vtln_pipeline_mesh_equals_single(corpus):
    """A VTLN-enabled pipeline (training + warped extraction, riding
    the shared signal cache) on an 8-device mesh equals unsharded
    execution."""
    config = get_default_config(
        'mfcc', with_delta=True, with_vtln='full')
    config['mfcc']['dither'] = 0
    config['vtln'].update(num_iters=1, subsample=2)
    config['vtln']['ubm'].update(
        num_gauss=4, num_iters=1, num_iters_init=2, num_frames=1000)
    config['vtln']['features']['mfcc']['dither'] = 0
    config['vtln']['ubm']['features']['mfcc']['dither'] = 0

    plain = extract_features(config, corpus)
    set_default_mesh(data_mesh(jax.devices()))
    try:
        sharded = extract_features(config, corpus)
    finally:
        set_default_mesh(None)

    assert sorted(sharded.keys()) == sorted(plain.keys())
    for name in plain:
        assert sharded[name].shape == plain[name].shape, name
        assert np.allclose(
            sharded[name].data, plain[name].data, atol=2e-4), name
        assert (sharded[name].properties['mfcc']['vtln_warp']
                == plain[name].properties['mfcc']['vtln_warp']), name


def test_shard_round_robin_covers_everything(corpus):
    names = []
    for process in range(3):
        shard = shard_utterances(
            corpus, process_index=process, process_count=3)
        names.extend(utt.name for utt in shard)
    assert sorted(names) == sorted(utt.name for utt in corpus)
