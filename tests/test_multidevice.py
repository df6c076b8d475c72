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


def test_train_ubm_equals_process_on_reversed_length_order(wav_file):
    """distributed.train_ubm must match DiagUbmProcessor.process when
    the corpus NAME order is opposite to its LENGTH order.

    The global voiced-frame order (which the seeded reservoir/init
    draws index into) is the streaming order — length-sorted — not
    the collection order; a corpus whose names sort opposite to its
    lengths catches any regression conflating the two (the usual
    fixtures' name order happens to equal their length order)."""
    import warnings

    from shennong_tpu.parallel.distributed import train_ubm
    from shennong_tpu.processor.ubm import DiagUbmProcessor

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        corpus = Utterances([
            ('u%d' % i, wav_file, 'spk%d' % (i % 2),
             0.02 * i, 1.32 - 0.1 * i)
            for i in range(6)])

    def make_ubm():
        proc = DiagUbmProcessor(
            num_gauss=4, num_iters=2, num_iters_init=2,
            num_frames=120, seed=0, vad={'energy_threshold': 5.0},
            remove_low_count_gaussians=False)
        proc.features['mfcc']['dither'] = 0
        return proc

    single = make_ubm()
    single.process(corpus)
    dist = make_ubm()
    train_ubm(dist, corpus)

    np.testing.assert_allclose(
        dist.gmm.weights, single.gmm.weights, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        dist.gmm.means, single.gmm.means, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        dist.gmm.inv_vars, single.gmm.inv_vars, rtol=2e-3, atol=1e-4)


def test_shard_round_robin_covers_everything(corpus):
    names = []
    for process in range(3):
        shard = shard_utterances(
            corpus, process_index=process, process_count=3)
        names.extend(utt.name for utt in shard)
    assert sorted(names) == sorted(utt.name for utt in corpus)


def test_em_train_steps_mesh_equals_single_device():
    """The mesh EM trainer (psum'd statistics per fused iteration)
    matches the single-device ``em_steps`` fusion."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shennong_tpu.ops import gmm as gmm_ops
    from shennong_tpu.parallel.fused import make_em_train_steps

    rng = np.random.RandomState(1)
    n, dim, num_gauss = 512, 6, 4
    flat = rng.randn(n, dim).astype(np.float32) * 3
    fweights = (rng.rand(n) > 0.2).astype(np.float32)
    weights = np.full(num_gauss, 1.0 / num_gauss, np.float32)
    means = rng.randn(num_gauss, dim).astype(np.float32)
    inv_vars = np.full((num_gauss, dim), 0.5, np.float32)

    _, w1, m1, iv1 = gmm_ops.em_steps(
        jnp.asarray(flat), jnp.asarray(fweights),
        jnp.asarray(weights), jnp.asarray(means),
        jnp.asarray(inv_vars), num_iters=3)

    mesh = data_mesh(jax.devices())
    step = make_em_train_steps(mesh, num_iters=3)
    shard = NamedSharding(mesh, P('data'))
    repl = NamedSharding(mesh, P())
    _, w2, m2, iv2 = step(
        jax.device_put(flat, shard), jax.device_put(fweights, shard),
        jax.device_put(weights, repl), jax.device_put(means, repl),
        jax.device_put(inv_vars, repl))

    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(w1), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2), np.asarray(m1), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(iv2), np.asarray(iv1), rtol=2e-3, atol=1e-4)


def test_lvtln_round_step_mesh_equals_unsharded():
    """The distributed LVTLN estimation round (psum'd fMLLR stats +
    replicated warp-class solve) matches the unsharded computation."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shennong_tpu.ops import fmllr as fmllr_ops
    from shennong_tpu.ops import gmm as gmm_ops
    from shennong_tpu.parallel.fused import make_lvtln_round_step

    rng = np.random.RandomState(2)
    n, dim, num_gauss, num_groups, num_classes = 256, 4, 6, 3, 5
    feats = rng.randn(n, dim).astype(np.float32)
    fweights = (rng.rand(n) > 0.1).astype(np.float32)
    gid = rng.randint(0, num_groups, n).astype(np.int32)
    weights = np.full(num_gauss, 1.0 / num_gauss, np.float32)
    means = rng.randn(num_gauss, dim).astype(np.float32)
    inv_vars = np.full((num_gauss, dim), 1.0, np.float32)
    base = np.stack([
        np.eye(dim) + 0.05 * rng.randn(dim, dim)
        for _ in range(num_classes)]).astype(np.float32)
    warps = np.linspace(0.9, 1.1, num_classes).astype(np.float32)

    # unsharded reference: same posterior + stats + solve pipeline
    k = 4
    _, gsel = gmm_ops.gaussian_selection(
        jnp.asarray(feats), jnp.asarray(weights), jnp.asarray(means),
        jnp.asarray(inv_vars), k)
    _, post = gmm_ops.posteriors_preselect(
        jnp.asarray(feats), gsel, jnp.asarray(weights),
        jnp.asarray(means), jnp.asarray(inv_vars))
    post = post * fweights[:, None]
    beta, K, G = fmllr_ops.fmllr_stats_groups(
        jnp.asarray(feats), gsel, post, jnp.asarray(gid),
        jnp.asarray(means), jnp.asarray(inv_vars), num_groups)
    sign_b, logdet_b = jnp.linalg.slogdet(jnp.asarray(base))
    t1, w1, c1, i1, b1 = fmllr_ops.solve_warp_classes(
        beta, K, G, jnp.asarray(base), jnp.asarray(warps),
        sign_b > 0, jnp.where(sign_b > 0, logdet_b, 0.0))

    mesh = data_mesh(jax.devices())
    step = make_lvtln_round_step(mesh, num_groups, num_gselect=k)
    shard = NamedSharding(mesh, P('data'))
    repl = NamedSharding(mesh, P())
    t2, w2, c2, i2, b2 = step(
        jax.device_put(feats, shard), jax.device_put(fweights, shard),
        jax.device_put(gid, shard), jax.device_put(base, repl),
        jax.device_put(warps, repl), jax.device_put(weights, repl),
        jax.device_put(means, repl), jax.device_put(inv_vars, repl))

    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w1))
    np.testing.assert_allclose(
        np.asarray(b2), np.asarray(b1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(t1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(i2), np.asarray(i1), rtol=1e-3, atol=1e-3)


def test_train_vtln_mesh_equals_plain(corpus):
    """distributed.train_vtln (mesh-fused rounds with psum'd fMLLR/EM
    statistics, allgathered base-transform moments) equals the plain
    single-process VtlnProcessor.process."""
    from shennong_tpu.parallel.distributed import train_vtln
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.processor.vtln import VtlnProcessor

    ubm_params = DiagUbmProcessor(
        num_gauss=4, num_iters=2, num_iters_init=2, num_frames=120,
        seed=0, vad={'energy_threshold': 5.0},
        remove_low_count_gaussians=False).get_params()
    ubm_params['features']['mfcc']['dither'] = 0

    def make_vtln():
        proc = VtlnProcessor(
            num_iters=2, min_warp=0.9, max_warp=1.1, warp_step=0.05,
            subsample=2, ubm=ubm_params)
        proc.features['mfcc']['dither'] = 0
        return proc

    plain = make_vtln()
    warps_plain = plain.process(corpus, group_by='speaker')
    dist = make_vtln()
    warps_dist = train_vtln(dist, corpus, group_by='speaker')

    assert warps_dist == warps_plain
    for utt in plain.transforms:
        np.testing.assert_allclose(
            dist.transforms[utt], plain.transforms[utt],
            rtol=5e-3, atol=5e-4, err_msg=utt)


def test_distributed_extract_features_vtln_wiring(corpus):
    """distributed.extract_features with a vtln config routes through
    train_vtln (fused-path configs) and equals the single-process
    run, warps included."""
    from shennong_tpu.parallel import distributed

    config = get_default_config('mfcc', with_vtln='full')
    config['mfcc']['dither'] = 0
    config['vtln'].update(num_iters=1, subsample=2)
    config['vtln']['ubm'].update(
        num_gauss=4, num_iters=1, num_iters_init=2, num_frames=1000)
    config['vtln']['features']['mfcc']['dither'] = 0
    config['vtln']['ubm']['features']['mfcc']['dither'] = 0

    dist = distributed.extract_features(config, corpus)
    single = extract_features(config, corpus)
    assert sorted(dist.keys()) == sorted(single.keys())
    for name in single:
        assert dist[name].shape == single[name].shape, name
        assert np.allclose(
            dist[name].data, single[name].data, atol=2e-4), name
        assert (dist[name].properties['mfcc']['vtln_warp']
                == single[name].properties['mfcc']['vtln_warp']), name


def test_train_ubm_with_removal_equals_process(wav_file):
    """distributed.train_ubm with remove_low_count_gaussians=True must
    run (the removal init loop consumes psum'd statistics, host
    updates in lockstep) and match single-process training."""
    import warnings

    from shennong_tpu.parallel.distributed import train_ubm
    from shennong_tpu.processor.ubm import DiagUbmProcessor

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        corpus = Utterances([
            ('u%d' % i, wav_file, 'spk%d' % (i % 2),
             0.02 * i, 1.32 - 0.1 * i)
            for i in range(6)])

    def make_ubm():
        proc = DiagUbmProcessor(
            num_gauss=4, num_iters=2, num_iters_init=3,
            num_frames=120, seed=0, vad={'energy_threshold': 5.0},
            min_gaussian_weight=0.01,
            remove_low_count_gaussians=True)
        proc.features['mfcc']['dither'] = 0
        return proc

    single = make_ubm()
    single.process(corpus)
    dist = make_ubm()
    train_ubm(dist, corpus)

    assert dist.gmm.num_gauss() == single.gmm.num_gauss()
    np.testing.assert_allclose(
        dist.gmm.weights, single.gmm.weights, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        dist.gmm.means, single.gmm.means, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        dist.gmm.inv_vars, single.gmm.inv_vars, rtol=2e-3, atol=1e-4)


def test_crepe_process_all_mesh_equals_single(wav_file):
    """CREPE's batched process_all (bespoke slice pipelining) on the
    8-device mesh is bit-identical to single-device execution: the
    CNN slice rows shard over the 'data' axis, padded rows decode to
    discarded outputs."""
    from shennong_tpu.processor.pitch_crepe import CrepePitchProcessor

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        corpus = Utterances([
            ('u%d' % i, wav_file, 0.03 * i, 0.7 + 0.09 * i)
            for i in range(5)])

    proc = CrepePitchProcessor(model_capacity='tiny')
    plain = proc.process_all(corpus)
    set_default_mesh(data_mesh(jax.devices()))
    try:
        sharded = proc.process_all(corpus)
    finally:
        set_default_mesh(None)

    assert sorted(sharded.keys()) == sorted(plain.keys())
    for name in plain:
        assert sharded[name].shape == plain[name].shape, name
        np.testing.assert_array_equal(
            sharded[name].data, plain[name].data, err_msg=name)


def test_bottleneck_process_all_mesh_equals_single(
        wav_file, tmp_path):
    """The batched bottleneck path (vmapped stacked network over row
    buckets) on the 8-device mesh is bit-identical to single-device
    execution (synthetic shape-correct weights; the pretrained npz
    cannot enter this environment)."""
    import shennong_tpu.processor.bottleneck as bn_module
    from shennong_tpu.processor.bottleneck import BottleneckProcessor

    rng = np.random.RandomState(0)
    params = {
        'context': np.int64(5),
        'input_mean': rng.randn(144) * 0.1,
        'input_std': np.abs(rng.randn(144)) * 0.5 + 0.5,
        'bn_mean': rng.randn(400) * 0.1,
        'bn_std': np.abs(rng.randn(400)) * 0.5 + 0.5,
    }
    for name, (nin, nout) in {
            'W1': (144, 90), 'W2': (90, 90), 'W3': (90, 80),
            'W5': (400, 90), 'W6': (90, 90), 'W7': (90, 90),
            'W8': (90, 80)}.items():
        params[name] = (
            rng.randn(nin, nout) / np.sqrt(nin)).astype(np.float32)
        params['b' + name[1:]] = (
            rng.randn(nout) * 0.1).astype(np.float32)
    np.savez(str(
        tmp_path / 'FisherEnglish_FBANK_HL500_SBN80_PhnStates120.npz'),
        **params)

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        corpus = Utterances([
            ('u%d' % i, wav_file, 0.02 * i, 0.8 + 0.07 * i)
            for i in range(5)])

    old_dir = bn_module._SHARE_DIR
    bn_module._SHARE_DIR = str(tmp_path)
    BottleneckProcessor._loaded_weights.clear()
    try:
        proc = BottleneckProcessor(weights='FisherMono', dither=0)
        plain = proc.process_all(corpus)
        set_default_mesh(data_mesh(jax.devices()))
        try:
            sharded = proc.process_all(corpus)
        finally:
            set_default_mesh(None)
    finally:
        bn_module._SHARE_DIR = old_dir
        BottleneckProcessor._loaded_weights.clear()

    assert sorted(sharded.keys()) == sorted(plain.keys())
    for name in plain:
        assert sharded[name].shape == plain[name].shape, name
        np.testing.assert_array_equal(
            sharded[name].data, plain[name].data, err_msg=name)
