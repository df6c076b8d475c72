"""Worker process for test_distributed_process.py (not a test module).

Joins a multi-process ``jax.distributed`` runtime on the CPU platform
and runs one of two modes:

- ``extract`` (default): extracts its utterance shard through
  :func:`shennong_tpu.parallel.distributed.extract_features` (pass 1
  on the local shard, CMVN statistics allreduced across processes,
  pass 2 locally) and saves the shard's features.
- ``train``: trains a UBM-GMM across the processes
  (:func:`shennong_tpu.parallel.distributed.train_ubm` — per-shard
  front-end, psum'd EM statistics) and runs one distributed LVTLN
  estimation round (:func:`...distributed.estimate_vtln` — local
  fMLLR stats, bit-exact allreduce, identical per-class solve), then
  saves the model and the transforms/warps; the test asserts both
  processes wrote the identical file and that it matches
  single-process training.
"""

import sys

import numpy as np

UBM_PARAMS = dict(
    num_gauss=4, num_iters=2, num_iters_init=3, num_frames=120,
    seed=0, vad={'energy_threshold': 5.0})


def make_lvtln(dim):
    """Deterministic warp-class base transforms shared by the worker
    and the single-process reference in the test."""
    from shennong_tpu.ops.fmllr import LinearVtln

    num_classes, default_class = 9, 4
    lvtln = LinearVtln(dim, num_classes, default_class)
    rng = np.random.RandomState(123)
    for c in range(num_classes):
        lvtln.set_transform(
            c, np.eye(dim) * (1.0 + 0.02 * (c - default_class))
            + 0.01 * rng.randn(dim, dim))
        lvtln.set_warp(c, 0.9 + 0.025 * c)
    return lvtln


def make_train_vtln():
    """The VtlnProcessor configuration of the full-training test
    (shared by the workers and the single-process reference)."""
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.processor.vtln import VtlnProcessor

    ubm_params = DiagUbmProcessor(
        **dict(UBM_PARAMS, remove_low_count_gaussians=False)
    ).get_params()
    ubm_params['features']['mfcc']['dither'] = 0
    vtln = VtlnProcessor(
        num_iters=2, min_warp=0.9, max_warp=1.1, warp_step=0.05,
        subsample=2, ubm=ubm_params)
    vtln.features['mfcc']['dither'] = 0
    return vtln


def run_train(utts_file, outfile):
    """Distributed UBM training + one LVTLN estimation round + the
    FULL distributed VTLN training."""
    from shennong_tpu import Utterances, pipeline
    from shennong_tpu.parallel import distributed
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.processor.vtln import VtlnProcessor

    utterances = Utterances.load(utts_file)
    ubm = DiagUbmProcessor(**UBM_PARAMS)
    ubm.features['mfcc']['dither'] = 0
    distributed.train_ubm(ubm, utterances)

    # one LVTLN estimation round on deterministic shard features
    shard = distributed.shard_utterances(list(utterances))
    config = pipeline.init_config({'mfcc': {'dither': 0}, 'delta': {}})
    feats = pipeline.extract_features(config, shard)
    ubm.gaussian_selection(feats)
    posteriors = ubm.gaussian_selection_to_post(feats)

    vtln = VtlnProcessor(ubm=ubm.get_params())
    vtln.lvtln = make_lvtln(ubm.gmm.dim())
    utt2speak = {utt.name: utt.speaker for utt in utterances}
    transforms, warps = distributed.estimate_vtln(
        vtln, ubm, feats, posteriors, utt2speak)

    # full VTLN training across the processes (UBM + base transforms
    # + every estimation round as mesh programs)
    full = make_train_vtln()
    full_warps = distributed.train_vtln(
        full, utterances, group_by='speaker')
    full_speakers = sorted(full_warps)
    full_utts = sorted(full.transforms)

    groups = sorted(transforms)
    np.savez(
        outfile,
        weights=ubm.gmm.weights, means=ubm.gmm.means,
        inv_vars=ubm.gmm.inv_vars,
        groups=np.array(groups),
        warps=np.array([warps[g] for g in groups]),
        transforms=np.stack([transforms[g] for g in groups]),
        full_speakers=np.array(full_speakers),
        full_warps=np.array(
            [full_warps[s] for s in full_speakers]),
        full_transforms=np.stack(
            [full.transforms[u] for u in full_utts]))


def run_extract(utts_file, outfile):
    from shennong_tpu import Utterances
    from shennong_tpu.parallel import distributed
    from shennong_tpu.pipeline import get_default_config

    config = get_default_config(
        'mfcc', with_cmvn=True, with_delta=True)
    config['mfcc']['dither'] = 0

    features = distributed.extract_features(
        config, Utterances.load(utts_file))
    features.save(outfile)


def main():
    utts_file, outfile, coordinator, nproc, pid = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else 'extract'

    import jax
    # pin CPU before any backend initializes (an accelerator plugin
    # would otherwise grab the runtime ahead of the distributed join)
    jax.config.update('jax_platforms', 'cpu')

    from shennong_tpu.parallel import distributed

    distributed.initialize(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()

    if mode == 'train':
        run_train(utts_file, outfile)
    else:
        run_extract(utts_file, outfile)
    return 0


if __name__ == '__main__':
    sys.exit(main())
