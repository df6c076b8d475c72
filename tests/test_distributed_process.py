"""Two real OS processes running the distributed extraction.

The simulated-shard test (tests/test_multidevice.py) checks the
sharding math inside one process; this one asserts the production
path: two processes join a ``jax.distributed`` runtime, each extracts
its round-robin shard, the CMVN statistics cross the process boundary
through a collective (speakers deliberately SPAN both shards, so a
host-local reduction would give wrong normalizations), and the merged
output equals the single-process run. Replaces the reference's SLURM
fan-out + filesystem merge (``examples/features_abx/run.sh:19-41``).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from shennong_tpu import FeaturesCollection, Utterances
from shennong_tpu.pipeline import extract_features, get_default_config

WORKER = os.path.join(os.path.dirname(__file__), 'distributed_worker.py')


@pytest.fixture
def corpus(wav_file):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        # round-robin sharding sends u0, u2 to process 0 and u1, u3 to
        # process 1: both speakers span both processes
        return Utterances([
            ('u0', wav_file, 'spk0', 0.0, 0.5),
            ('u1', wav_file, 'spk0', 0.3, 0.9),
            ('u2', wav_file, 'spk1', 0.1, 0.7),
            ('u3', wav_file, 'spk1', 0.4, 1.0)])


def _free_port():
    with socket.socket() as sock:
        sock.bind(('127.0.0.1', 0))
        return sock.getsockname()[1]


def test_two_process_extraction_equals_single(tmp_path, corpus):
    utts_file = str(tmp_path / 'utts.txt')
    corpus.save(utts_file)

    coordinator = f'127.0.0.1:{_free_port()}'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env['PYTHONPATH'] = os.pathsep.join(
        [repo] + env.get('PYTHONPATH', '').split(os.pathsep))
    env.pop('XLA_FLAGS', None)  # no virtual-device fan-out in workers
    outs = [str(tmp_path / f'shard{i}.npz') for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, utts_file, outs[i],
             coordinator, '2', str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [proc.communicate(timeout=600)[0] for proc in procs]
    for proc, log in zip(procs, logs):
        assert proc.returncode == 0, log.decode(errors='replace')

    merged = {}
    for out in outs:
        merged.update(FeaturesCollection.load(out).items())
    assert sorted(merged) == ['u0', 'u1', 'u2', 'u3']

    config = get_default_config('mfcc', with_cmvn=True, with_delta=True)
    config['mfcc']['dither'] = 0
    single = extract_features(config, corpus)

    for name in single:
        assert merged[name].shape == single[name].shape, name
        np.testing.assert_allclose(
            merged[name].data, single[name].data, atol=2e-4,
            err_msg=name)


def test_two_process_training_equals_single(tmp_path, corpus):
    """Distributed TRAINING, not just extraction: two real OS
    processes train the UBM (per-shard front-ends, psum'd EM
    statistics over the global mesh) and run one LVTLN estimation
    round (local fMLLR stats, bit-exact allreduce, identical solve).
    Both processes must produce the identical model, and it must match
    single-process training. Replaces the reference's SLURM VTLN
    fan-out (``examples/vtln_training/run.sh:16-23``)."""
    import warnings

    utts_file = str(tmp_path / 'utts.txt')
    corpus.save(utts_file)

    coordinator = f'127.0.0.1:{_free_port()}'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env['PYTHONPATH'] = os.pathsep.join(
        [repo] + env.get('PYTHONPATH', '').split(os.pathsep))
    env.pop('XLA_FLAGS', None)  # no virtual-device fan-out in workers
    outs = [str(tmp_path / f'model{i}.npz') for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, utts_file, outs[i],
             coordinator, '2', str(i), 'train'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [proc.communicate(timeout=600)[0] for proc in procs]
    for proc, log in zip(procs, logs):
        assert proc.returncode == 0, log.decode(errors='replace')

    models = [dict(np.load(out, allow_pickle=True)) for out in outs]
    # the collectives are bit-exact and the updates host-identical:
    # both processes hold the very same model
    for key in models[0]:
        np.testing.assert_array_equal(
            models[0][key], models[1][key], err_msg=key)
    dist = models[0]

    # single-process reference (same seed, same deterministic
    # features): the distributed run must match it
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'distributed_worker', WORKER)
    worker_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker_mod)
    UBM_PARAMS, make_lvtln = worker_mod.UBM_PARAMS, worker_mod.make_lvtln
    from shennong_tpu import pipeline
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.processor.vtln import VtlnProcessor

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ubm = DiagUbmProcessor(**UBM_PARAMS)
        ubm.features['mfcc']['dither'] = 0
        ubm.process(corpus)
    np.testing.assert_allclose(
        dist['weights'], ubm.gmm.weights, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        dist['means'], ubm.gmm.means, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        dist['inv_vars'], ubm.gmm.inv_vars, rtol=2e-3, atol=2e-3)

    # the LVTLN round, single-process, with the DISTRIBUTED GMM (so
    # only the stat accumulation path differs)
    from shennong_tpu.processor.ubm import DiagGmm
    ubm.gmm = DiagGmm(
        dist['weights'], dist['means'], dist['inv_vars'])
    ubm.selection = None
    config = pipeline.init_config({'mfcc': {'dither': 0}, 'delta': {}})
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        feats = pipeline.extract_features(config, corpus)
        ubm.gaussian_selection(feats)
        posteriors = ubm.gaussian_selection_to_post(feats)
        vtln = VtlnProcessor(ubm=ubm.get_params())
        vtln.lvtln = make_lvtln(ubm.gmm.dim())
        utt2speak = {utt.name: utt.speaker for utt in corpus}
        transforms, warps = vtln.estimate(
            ubm, feats, posteriors, utt2speak)

    groups = sorted(transforms)
    assert list(dist['groups']) == groups
    np.testing.assert_allclose(
        dist['warps'],
        np.array([warps[g] for g in groups]), atol=1e-12)
    # the float64 stats sum over different chunk boundaries per
    # process, so the solved transforms agree to rounding, not bits
    np.testing.assert_allclose(
        dist['transforms'],
        np.stack([transforms[g] for g in groups]),
        rtol=1e-4, atol=1e-6)

    # the FULL distributed VTLN training (UBM + base transforms +
    # mesh-fused rounds across both processes) must match plain
    # single-process VtlnProcessor.process
    plain = worker_mod.make_train_vtln()
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        warps_plain = plain.process(corpus, group_by='speaker')
    assert list(dist['full_speakers']) == sorted(warps_plain)
    np.testing.assert_allclose(
        dist['full_warps'],
        np.array([warps_plain[s] for s in sorted(warps_plain)]),
        atol=1e-12)
    # transform entries span O(1) diagonals to O(1e-5) cross terms;
    # the two-process UBM differs from single-process at the float32
    # accumulation level, so near-zero entries only agree absolutely
    np.testing.assert_allclose(
        dist['full_transforms'],
        np.stack([
            plain.transforms[u] for u in sorted(plain.transforms)]),
        rtol=3e-2, atol=3e-3)
