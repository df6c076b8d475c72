"""Multi-host distributed extraction (DCN-scale).

Replaces the reference's SLURM fan-out scripts (its only cluster
story, ``examples/features_abx/run.sh``) with ``jax.distributed``:
each host initializes into the global runtime, processes its shard of
the utterance list on its local devices, and corpus statistics (CMVN,
GMM EM accumulators) reduce over the global mesh — ICI within a pod,
DCN across hosts — instead of through the filesystem.
"""

import jax

from shennong_tpu.logger import get_logger


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, log=get_logger('distributed', 'info')):
    """Join the multi-host runtime (no-op when single-process).

    Arguments default to the cluster auto-detection of
    ``jax.distributed.initialize`` (TPU pods populate them from the
    environment).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    log.info(
        'joined distributed runtime: process %d/%d, %d local / %d '
        'global devices', jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())


def shard_utterances(utterances, process_index=None,
                     process_count=None):
    """The contiguous slice of ``utterances`` owned by this host.

    Utterances are split round-robin after sorting (the collection
    iterates in sorted order), balancing counts across hosts; features
    computed per host can be saved independently or gathered by the
    caller.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()

    owned = [
        utt for i, utt in enumerate(utterances)
        if i % process_count == process_index]
    if not owned:
        return None
    from shennong_tpu import Utterances
    return Utterances(owned)


def reduce_cmvn_stats(local_stats, group_keys):
    """Sum per-group CMVN statistics over every process.

    ``group_keys`` is the GLOBAL ordered key list — every process must
    pass the same one (each process knows the full utterance
    collection and shards it deterministically, so the global speaker
    set is known everywhere). Groups absent from ``local_stats``
    contribute zeros. Returns a dict over ``group_keys`` with the
    summed ``[2, dim+1]`` float64 statistics.

    This replaces the reference cluster recipe's filesystem hand-off
    (each SLURM task writing partial features for a later merge,
    ``examples/features_abx/run.sh``) with one collective.
    """
    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    if not group_keys:
        return {}
    if not local_stats:
        raise ValueError('local_stats is empty: every process must '
                         'own at least one utterance')
    template = np.zeros_like(next(iter(local_stats.values())))
    stacked = np.stack([
        np.asarray(local_stats[key]) if key in local_stats
        else template for key in group_keys])
    if jax.process_count() == 1:
        total = stacked.astype(np.float64)
    else:
        # gather the float64 statistics bit-exactly: view the bytes
        # as uint32 words (x64-safe over the collective), then view
        # back and sum in float64 so multi-process normalization
        # matches the single-process run beyond float32 rounding
        bits = np.ascontiguousarray(
            stacked.astype(np.float64)).view(np.uint32)
        gathered = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(bits)))
        total = np.ascontiguousarray(gathered).view(
            np.float64).sum(axis=0)
    return {key: total[i] for i, key in enumerate(group_keys)}


def extract_features(configuration, utterances, njobs=1,
                     log=get_logger('distributed', 'info')):
    """Multi-process ``pipeline.extract_features``.

    Every process receives the FULL utterance collection, takes its
    round-robin shard, runs pass 1 locally, allreduces the CMVN
    statistics across processes (so normalization groups spanning
    hosts see the global statistics, exactly like the single-process
    run) and returns the features of its own shard. The union of the
    per-process collections equals the single-process output.

    VTLN warps, when configured, are trained on the full collection in
    every process — duplicated work, but byte-identical warps on every
    host without a broadcast.
    """
    from shennong_tpu import pipeline as pipe

    utterances = list(utterances)
    config = pipe.init_config(configuration, log=log)
    # every process sees the same collection, so this raises on ALL
    # of them consistently — an asymmetric death on one process would
    # leave the others blocked in the CMVN allgather collective
    if jax.process_count() > len(utterances):
        raise ValueError(
            'only %d utterances for %d processes: run with at most '
            '%d processes'
            % (len(utterances), jax.process_count(), len(utterances)))
    shard = shard_utterances(utterances)
    if shard is None:
        raise ValueError(
            'process %d owns no utterances: run with at most %d '
            'processes' % (jax.process_index(), len(utterances)))

    manager = pipe.PipelineManager(config, shard, log=log)
    if 'vtln' in config:
        from shennong_tpu import Utterances
        manager.warps = manager.make('vtln').process(
            Utterances(utterances), njobs=njobs)

    pass_one = pipe._batched_pass_one(manager, list(shard), log, njobs)
    if pass_one is None:
        pass_one = [
            pipe._extract_pass_one(utterance, manager, log=log)
            for utterance in shard]

    if 'cmvn' in config:
        by_speaker = config['cmvn']['by_speaker']
        global_keys = sorted(set(
            utt.speaker if by_speaker else utt.name
            for utt in utterances))
        manager.cmvn_stats = reduce_cmvn_stats(
            manager.cmvn_stats, global_keys)

    return pipe._batched_pass_two(manager, pass_one, log)
