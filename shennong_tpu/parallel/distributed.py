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
    """The subset of ``utterances`` owned by this host.

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

    if not group_keys:
        return {}
    # a process whose shard produced no statistics must still join
    # the collective (an asymmetric raise here would deadlock its
    # peers in the allreduce): exchange the stats width so it can
    # contribute zeros; if EVERY process is empty, all of them see
    # width 0 and raise together
    local_shape = (
        np.asarray(next(iter(local_stats.values()))).shape
        if local_stats else (0, 0))
    shapes = _allgather_host([float(d) for d in local_shape])
    rows, cols = (int(v) for v in shapes.max(axis=0))
    if cols == 0:
        raise ValueError(
            'no process produced any CMVN statistics')
    template = np.zeros((rows, cols))
    stacked = np.stack([
        np.asarray(local_stats[key]) if key in local_stats
        else template for key in group_keys])
    # bit-exact float64 sum over processes, so multi-process
    # normalization matches the single-process run beyond float32
    # rounding
    total = allreduce_f64(stacked)
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

    VTLN warps, when configured, train distributed
    (:func:`train_vtln` — per-shard front-ends, psum'd statistics)
    whenever the configuration takes the fused path; otherwise every
    process trains on the full collection — duplicated work, but
    byte-identical warps on every host without a broadcast.
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
        vtln_proc = manager.make('vtln')
        # the eligibility checks inside train_vtln are functions of
        # the FULL collection and the configuration, so every process
        # takes the same branch
        try:
            manager.warps = train_vtln(
                vtln_proc, Utterances(utterances), njobs=njobs,
                log=log)
        except ValueError as err:
            log.info(
                'distributed VTLN unavailable (%s): training on the '
                'full collection in every process', err)
            manager.warps = vtln_proc.process(
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


def allreduce_f64(array):
    """Bit-exact float64 sum of a host array over every process.

    The float64 words cross the collective as uint32 views (x64-safe)
    and the sum over the gathered stack runs in the same order on
    every process, so the result is bit-identical everywhere —
    distributed model updates stay in lockstep without a broadcast.
    """
    import numpy as np

    arr = np.ascontiguousarray(
        np.atleast_1d(np.asarray(array, dtype=np.float64)))
    # summing the [P, ...] gathered stack in the same rank order on
    # every process keeps the result bit-identical everywhere
    return _allgather_host(arr.reshape(-1)).sum(
        axis=0).reshape(arr.shape)


def _global_data_mesh():
    """A 1-axis ``'data'`` mesh over every device of every process."""
    import numpy as np

    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ('data',))


def _shard_rows(mesh, *arrays):
    """Global row-sharded arrays from per-process local rows.

    Pads each process's rows to the global per-process maximum (a
    multiple of the local device count), marking padding with zero
    weight — callers pass 0/1 weight vectors alongside the data, so
    padded rows are inert. Returns the global arrays, sharded over
    the mesh's ``'data'`` axis.
    """
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    local_rows = arrays[0].shape[0]
    ndev_local = max(jax.local_device_count(), 1)
    # per-process row counts AND local device counts, exchanged once:
    # every process must agree on rows_max (the global shape depends
    # on it), which requires the padding multiple to be global too
    counts = np.zeros(2 * jax.process_count())
    counts[jax.process_index()] = local_rows
    counts[jax.process_count() + jax.process_index()] = ndev_local
    counts = allreduce_f64(counts)
    ndevs = counts[jax.process_count():].astype(np.int64)
    if not (ndevs == ndev_local).all():
        # every process pads to the SAME rows_max, so unequal local
        # device counts cannot tile the global array evenly — fail
        # loudly instead of building conflicting global shapes
        raise ValueError(
            'distributed row sharding requires every process to hold '
            'the same number of local devices, got {}'.format(
                ndevs.tolist()))
    rows_max = int(counts[:jax.process_count()].max())
    rows_max += (-rows_max) % ndev_local

    sharding = NamedSharding(mesh, P('data'))
    out = []
    for arr in arrays:
        arr = np.asarray(arr)
        pad = [(0, rows_max - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        out.append(jax.make_array_from_process_local_data(
            sharding, np.pad(arr, pad)))
    return out


def train_ubm(ubm, utterances, njobs=1, signal_cache=None,
              log=get_logger('distributed', 'info')):
    """Multi-process UBM-GMM training (``DiagUbmProcessor.process``).

    Every process receives the FULL utterance collection, streams the
    feature front-end over its round-robin shard only, and the
    training statistics cross process boundaries as collectives — the
    TPU-native replacement for the reference's SLURM fan-out with
    filesystem accumulator merges (``examples/vtln_training/run.sh``):

    - the reservoir subset, the random init means and the global data
      variance are computed against the GLOBAL voiced-frame order
      (per-utterance voiced counts are exchanged once), so the
      initialization consumes the seeded RNG exactly like the
      single-process trainer;
    - every EM iteration (init loop with splits, then the main loop)
      runs as one fused mesh program whose statistics psum over all
      devices of all processes
      (:func:`shennong_tpu.parallel.fused.make_em_train_steps`);
    - host-side steps (splits, the component-removing final update)
      see bit-identical inputs everywhere, so the model stays in
      lockstep without any broadcast.

    Mutates ``ubm.gmm`` (identically on every process) like
    ``process()`` does. With one process this reduces to the
    single-process device path.
    """
    import numpy as np
    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as P

    from shennong_tpu.ops import gmm as gmm_ops
    from shennong_tpu.parallel.fused import (
        make_accumulate_step, make_em_train_steps)
    from shennong_tpu.processor.ubm import DiagGmm, stream_frontend

    utterances = list(utterances)
    if jax.process_count() > len(utterances):
        raise ValueError(
            'only %d utterances for %d processes'
            % (len(utterances), jax.process_count()))
    shard = shard_utterances(utterances)

    # eligibility decided on the FULL collection so every process
    # raises (or proceeds) consistently — a per-shard gate could fail
    # on one process only and deadlock the collectives
    from shennong_tpu.processor.ubm import fused_frontend_supported
    if not fused_frontend_supported(ubm.features, utterances):
        raise ValueError(
            'distributed UBM training needs the fused MFCC front-end '
            '(plain MFCC features, single sample rate, utterances '
            'under the chunking limit)')

    log.info(
        'Training UBM across %d processes (%d global devices)',
        jax.process_count(), jax.device_count())
    front = stream_frontend(
        ubm.features, ubm.vad, ubm.subsample, shard, njobs=njobs,
        signal_cache=(
            signal_cache if signal_cache is not None
            else getattr(ubm, '_signal_cache', None)))
    assert front is not None  # gated above on the full collection
    flat, w_init, w_em, num_read_local, layout = front

    # -------- global voiced-frame order (one counts exchange) -------
    # global voiced index = position in the concatenation of every
    # utterance's voiced frames, utterances in the full collection's
    # STREAMING order (length-sorted, ties by collection order): the
    # exact order the single-process front-end produces — indexing by
    # collection order instead would pick different reservoir/init
    # frames whenever name order differs from length order
    from shennong_tpu.parallel.stream import streamed_order
    w_init_h = np.asarray(w_init)
    local_voiced = {}      # name -> local flat row indices, in order
    for names, frames_per_row, offset in layout:
        for j, name in enumerate(names):
            rows = np.flatnonzero(
                w_init_h[offset + j * frames_per_row:
                         offset + (j + 1) * frames_per_row])
            local_voiced[name] = rows + offset + j * frames_per_row

    order = [
        utterances[i].name for i in streamed_order(utterances)]
    counts = np.zeros(len(order))
    for i, name in enumerate(order):
        if name in local_voiced:
            counts[i] = len(local_voiced[name])
    counts = allreduce_f64(counts).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    num_read = int(counts.sum())
    assert num_read == int(allreduce_f64(
        np.array([float(num_read_local)]))[0])

    owned_globals = np.concatenate([
        np.arange(offsets[i], offsets[i] + counts[i], dtype=np.int64)
        for i, name in enumerate(order) if name in local_voiced]
        or [np.zeros(0, np.int64)])
    owned_rows = np.concatenate([
        local_voiced[name]
        for name in order if name in local_voiced]
        or [np.zeros(0, np.int64)])

    def rows_of(global_idx):
        """(mask, local rows) of the globally-indexed voiced frames
        this process owns."""
        if not len(owned_globals):
            # a shard of entirely unvoiced utterances owns nothing;
            # it must still reach the collectives below
            return (np.zeros(np.shape(global_idx), bool),
                    np.zeros(0, np.int64))
        pos = np.searchsorted(owned_globals, global_idx)
        pos_c = np.minimum(pos, max(len(owned_globals) - 1, 0))
        mask = (pos < len(owned_globals)) & (
            owned_globals[pos_c] == global_idx)
        return mask, owned_rows[pos_c[mask]]

    # ----------------- initialization (same RNG draws) ---------------
    num_gauss_init = int(
        ubm.initial_gauss_proportion * ubm.num_gauss)
    log.info('Initializing model')
    if num_read > ubm.num_frames:
        kept = ubm._reservoir_indices(num_read)
        avail = ubm.num_frames
        mask, rows_kept = rows_of(kept)
        sel = np.zeros(flat.shape[0], np.float32)
        sel[rows_kept] = 1.0
        sel_dev = jnp.asarray(sel)
    else:
        kept = None
        avail = num_read
        sel_dev = w_init
    if avail < 10 * num_gauss_init:
        raise ValueError(
            f'Too few frames to train on ({avail} frames)')

    kwargs = dict(
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    sums = allreduce_f64(np.asarray(
        jnp.einsum('nd,n->d', flat, sel_dev, **kwargs), np.float64))
    sqsums = allreduce_f64(np.asarray(
        jnp.einsum('nd,nd,n->d', flat, flat, sel_dev, **kwargs),
        np.float64))
    mean = sums / avail
    var = sqsums / avail - mean ** 2
    if var.max() <= 0:
        raise ValueError(
            f'Features do not have positive variance {var}')

    chosen = ubm._rng.choice(avail, num_gauss_init, replace=False)
    global_chosen = kept[chosen] if kept is not None else chosen
    mask, rows_chosen = rows_of(np.asarray(global_chosen))
    means0 = np.zeros((num_gauss_init, flat.shape[1]))
    if mask.any():
        means0[np.flatnonzero(mask)] = np.asarray(
            jnp.take(flat, jnp.asarray(rows_chosen), axis=0),
            np.float64)
    means0 = allreduce_f64(means0)
    ubm.gmm = DiagGmm(
        np.full(num_gauss_init, 1.0 / num_gauss_init), means0,
        np.tile(1.0 / var, (num_gauss_init, 1)))

    # ------------------- mesh-fused EM iterations --------------------
    mesh = _global_data_mesh()
    flat_g, sel_g, wem_g = _shard_rows(mesh, flat, sel_dev, w_em)
    replicated = NamedSharding(mesh, P())
    steps_cache = {}

    def em_on(weights_g):
        def em_fn(params, num_iters):
            if num_iters not in steps_cache:
                steps_cache[num_iters] = make_em_train_steps(
                    mesh, num_iters=num_iters,
                    min_gaussian_weight=ubm._min_gaussian_weight)
            params = [
                jax.device_put(np.asarray(p, np.float32), replicated)
                for p in params]
            return steps_cache[num_iters](
                flat_g, weights_g, *params)
        return em_fn

    def accumulate_on(weights_g):
        # psum'd statistics for the component-removing init path:
        # every process receives bit-identical global accumulators,
        # so the host-side removal decisions stay in lockstep
        def accumulate_fn(params):
            if 'acc' not in steps_cache:
                steps_cache['acc'] = make_accumulate_step(mesh)
            params = [
                jax.device_put(np.asarray(p, np.float32), replicated)
                for p in params]
            return steps_cache['acc'](flat_g, weights_g, *params)
        return accumulate_fn

    ubm._init_em_loop(
        None, None, num_gauss_init, avail, em_fn=em_on(sel_g),
        accumulate_fn=accumulate_on(sel_g))

    log.info('Training for %s iterations', ubm.num_iters)
    em_fn = em_on(wem_g)
    params = ubm.gmm.as_jax()
    if ubm.num_iters > 0 and ubm.remove_low_count_gaussians:
        if ubm.num_iters > 1:
            _, *params = em_fn(params, ubm.num_iters - 1)
        _, occ, mean_acc, var_acc = accumulate_on(wem_g)(params)
        ubm.gmm = DiagGmm(*[
            np.asarray(p, dtype=np.float64) for p in params])
        ubm.estimate((
            np.asarray(occ, dtype=np.float64),
            np.asarray(mean_acc, dtype=np.float64),
            np.asarray(var_acc, dtype=np.float64)))
    elif ubm.num_iters > 0:
        _, *params = em_fn(params, ubm.num_iters)
        ubm.gmm = DiagGmm(*[
            np.asarray(p, dtype=np.float64) for p in params])
    log.info('Done training UBM.')
    return ubm.gmm


def estimate_vtln(vtln, ubm, feats_collection, posteriors, utt2speak,
                  log=get_logger('distributed', 'info')):
    """Multi-process ``VtlnProcessor.estimate``: one LVTLN round.

    ``feats_collection``/``posteriors`` hold THIS process's utterance
    shard; ``utt2speak`` maps the FULL collection (every process passes
    the same one, so the global group list is known everywhere). The
    per-group fMLLR statistics accumulate locally on device, allreduce
    bit-exactly across processes and every process solves the identical
    per-(group, warp-class) objective. Returns (transforms, warps)
    over ALL groups, identical on every process.
    """
    import numpy as np

    groups_all = {}
    for utt, spk in utt2speak.items():
        groups_all.setdefault(spk, []).append(utt)
    local_groups = {
        spk: [utt for utt in utts if utt in feats_collection]
        for spk, utts in groups_all.items()}

    group_stats = vtln._accumulate_group_stats(
        ubm, feats_collection, posteriors, local_groups)
    names = sorted(group_stats)
    beta = allreduce_f64([group_stats[g].beta for g in names])
    K = allreduce_f64(np.stack([group_stats[g].K for g in names]))
    G = allreduce_f64(np.stack([group_stats[g].G for g in names]))

    transforms, warps = {}, {}
    for i, group in enumerate(names):
        stats = group_stats[group]
        stats.beta, stats.K, stats.G = beta[i], K[i], G[i]
        class_idx, _, transform, objf_impr, count = (
            vtln.lvtln.compute_transform(
                stats, vtln.norm_type, vtln.logdet_scale))
        transforms[group] = transform
        warps[group] = vtln.lvtln.get_warp(class_idx)
        log.debug(
            '%s: auxf-impr from LVTLN is %s, over %s frames',
            group, objf_impr / max(count, 1e-10), count)
    return transforms, warps


def _allgather_host(vector):
    """[P, L] gather of a per-process float64 host vector (identical
    result on every process; no summing — rank order preserved)."""
    import numpy as np

    vector = np.ascontiguousarray(np.asarray(vector, np.float64))
    if jax.process_count() == 1:
        return vector[None]

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    bits = vector.view(np.uint32)
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(bits)))
    return np.ascontiguousarray(gathered).view(np.float64)


def train_vtln(vtln, utterances, group_by='utterance', njobs=1,
               log=get_logger('distributed', 'info')):
    """Multi-process ``VtlnProcessor.process``: full LVTLN training.

    The complete training flow of the fused single-process path
    (``VtlnProcessor._device_body``) with every corpus reduction
    crossing process boundaries as a collective:

    - the UBM trains through :func:`train_ubm` (per-shard front-ends,
      psum'd EM statistics);
    - the warp-class base transforms come from per-shard centered LS
      moments, merged bit-identically on every process (the merge is
      associative, :func:`shennong_tpu.ops.fmllr.merge_moments`);
    - every estimation round runs as ONE mesh program whose fMLLR
      statistics and EM accumulators psum over all devices of all
      processes (:func:`...fused.make_lvtln_train_steps`).

    Every process ends up holding the identical model, transforms and
    warps — the reference's SLURM VTLN fan-out
    (``examples/vtln_training/run.sh:16-23``) without a filesystem
    merge. Returns the warp dict (by utterance or speaker, like
    ``process()``); ``vtln.transforms`` / ``vtln.warps`` are set.
    Requires the fused path (plain MFCC features, no shape-changing
    UBM updates).
    """
    import copy

    import numpy as np
    import jax.numpy as jnp

    from shennong_tpu import pipeline as pipe
    from shennong_tpu.logger import null_logger
    from shennong_tpu.ops import gmm as gmm_ops
    from shennong_tpu.ops.fmllr import (
        LinearVtln, merge_moments, solve_mapping_from_moments)
    from shennong_tpu.parallel.fused import make_lvtln_train_steps
    from shennong_tpu.processor.ubm import (
        DiagGmm, DiagUbmProcessor, stream_frontend)

    if group_by not in ('utterance', 'speaker'):
        raise ValueError(
            f'group_by must be "utterance" or "speaker", '
            f'it is: {group_by}')
    if group_by == 'speaker' and not vtln.by_speaker:
        raise ValueError(
            'Asking to group warps by speaker but they are computed '
            'per utterance, please set VtlnProcessor.by_speaker to '
            'True')
    utterances_list = list(utterances)
    utt2speak = None
    if vtln.by_speaker:
        utt2speak = {
            utt.name: utt.speaker for utt in utterances_list}
        if any(spk is None for spk in utt2speak.values()):
            raise ValueError(
                'Requested speaker based VTLN, but speaker '
                'information is missing')
    if vtln.min_warp > vtln.max_warp:
        raise ValueError(
            f'Min warp > max warp: {vtln.min_warp} > {vtln.max_warp}')

    # eligibility of BOTH front-ends decided up front on the FULL
    # collection (consistent raise on every process, and before any
    # training work is spent; see train_ubm for its own ubm.features
    # gate)
    from shennong_tpu.processor.ubm import fused_frontend_supported
    if not fused_frontend_supported(vtln.features, utterances_list):
        raise ValueError(
            'distributed VTLN training needs the fused MFCC '
            'front-end (plain MFCC features, single sample rate, '
            'utterances under the chunking limit)')

    # one device-signal cache spans every corpus sweep of the flow
    # (UBM front-end, VTLN front-end, warp moments), like the
    # single-process VtlnProcessor.process: each process's shard
    # audio uploads once
    from shennong_tpu.parallel.stream import SignalCache
    signal_cache = SignalCache()

    # ---------------------------------------------- UBM (distributed)
    ubm = DiagUbmProcessor(**vtln.ubm)
    ubm.log.setLevel(log.getEffectiveLevel())
    if ubm.remove_low_count_gaussians:
        raise ValueError(
            'distributed VTLN training needs a fixed-size UBM: set '
            'ubm.remove_low_count_gaussians to False')
    train_ubm(
        ubm, utterances_list, njobs=njobs,
        signal_cache=signal_cache, log=log)
    vtln.ubm = ubm.get_params()

    log.info('Initializing base LVTLN transforms')
    dim = ubm.gmm.dim()
    num_classes = int(
        1.5 + (vtln.max_warp - vtln.min_warp) / vtln.warp_step)
    default_class = int(0.5 + (1 - vtln.min_warp) / vtln.warp_step)
    vtln.lvtln = LinearVtln(dim, num_classes, default_class)
    class_warps = [
        vtln.min_warp + c * vtln.warp_step for c in range(num_classes)]

    # ------------------------------------- front-end on the shard
    shard = shard_utterances(utterances_list)
    features_config = copy.deepcopy(vtln.features)
    front = stream_frontend(
        features_config, ubm.vad, vtln.subsample, shard, njobs=njobs,
        signal_cache=signal_cache)
    assert front is not None  # gated above on the full collection
    flat, _, w_em, _, layout = front
    w_host = np.asarray(w_em)

    # --------------------- warp-class base transforms (allgathered)
    keep = {}
    for names, frames_per_row, offset in layout:
        for row, name in enumerate(names):
            start = offset + row * frames_per_row
            keep[name] = w_host[start:start + frames_per_row]
    base_features = {
        k: v for k, v in vtln.features.items()
        if k != 'sliding_window_cmvn'}
    moments = pipe.accumulate_warp_mapping_stats(
        base_features, shard, class_warps, keep, null_logger(),
        njobs=njobs, signal_cache=signal_cache)
    if moments is None:
        raise ValueError(
            'distributed VTLN training needs the fused warp-moment '
            'pass (plain single-rate MFCC features)')
    local = merge_moments(moments)
    sizes = [np.asarray(m, np.float64).size for m in local]
    flat_local = np.concatenate(
        [np.asarray(m, np.float64).reshape(-1) for m in local])
    gathered = _allgather_host(flat_local)
    merged = []
    for rank_vec in gathered:
        parts, pos = [], 0
        for template, size in zip(local, sizes):
            shape = np.asarray(template).shape
            parts.append(rank_vec[pos:pos + size].reshape(shape))
            pos += size
        merged.append(tuple(parts))
    log.info(
        'Computing base transforms for %s warp classes '
        '(fused device pass, %d processes)', num_classes,
        jax.process_count())
    matrices = solve_mapping_from_moments(merged)
    for c, this_warp in enumerate(class_warps):
        vtln.lvtln.set_transform(c, matrices[c])
        vtln.lvtln.set_warp(c, this_warp)

    # --------------------------- group ids against the GLOBAL list
    def group_of(name):
        return utt2speak[name] if utt2speak is not None else name

    group_names = sorted(
        {group_of(utt.name) for utt in utterances_list})
    gindex = {g: i for i, g in enumerate(group_names)}
    gid = np.zeros(flat.shape[0], dtype=np.int32)
    for names, frames_per_row, offset in layout:
        for row, name in enumerate(names):
            start = offset + row * frames_per_row
            gid[start:start + frames_per_row] = gindex[group_of(name)]

    if ubm.num_gselect > ubm.gmm.num_gauss():
        ubm.num_gselect = ubm.gmm.num_gauss()
    _, gsel = gmm_ops.gaussian_selection(
        flat, *ubm.gmm.as_jax(), ubm.num_gselect)

    # ------------------------------- mesh-fused estimation rounds
    log.info(
        'Computing LVTLN transforms (%s iterations, %d global '
        'devices)', vtln.num_iters, jax.device_count())
    mesh = _global_data_mesh()
    flat_g, wem_g, gid_g, gsel_g = _shard_rows(
        mesh, flat, w_em, gid, gsel)
    from jax.sharding import NamedSharding, PartitionSpec as P
    replicated = NamedSharding(mesh, P())
    rounds = make_lvtln_train_steps(
        mesh, num_groups=len(group_names), num_iters=vtln.num_iters,
        norm_type=vtln.norm_type, logdet_scale=vtln.logdet_scale,
        default_class=default_class,
        min_gaussian_weight=ubm.min_gaussian_weight)
    out = rounds(
        flat_g, wem_g, gid_g, gsel_g,
        jax.device_put(np.asarray(
            vtln.lvtln.transforms, np.float32), replicated),
        jax.device_put(np.asarray(
            vtln.lvtln.warps, np.float32), replicated),
        *[jax.device_put(np.asarray(p, np.float32), replicated)
          for p in ubm.gmm.as_jax()])
    (gmm_w, gmm_m, gmm_iv, transforms, _, best, impr, beta) = (
        np.asarray(o) for o in out)

    ubm.gmm = DiagGmm(
        gmm_w.astype(np.float64), gmm_m.astype(np.float64),
        gmm_iv.astype(np.float64))
    vtln.transforms = {
        name: transforms[i].astype(np.float64)
        for i, name in enumerate(group_names)}
    vtln.warps = {
        name: float(vtln.lvtln.warps[best[i]])
        for i, name in enumerate(group_names)}
    log.debug(
        'overall LVTLN auxf-impr per frame is %s over %s frames',
        impr.sum() / max(beta.sum(), 1e-10), beta.sum())

    if vtln.by_speaker:
        vtln.transforms = {
            utt: vtln.transforms[spk] for utt, spk in utt2speak.items()}
        vtln.warps = {
            utt: vtln.warps[spk] for utt, spk in utt2speak.items()}
    log.info('Done training LVTLN model')
    if group_by == 'utterance':
        return dict(vtln.warps)
    return {
        spk: vtln.warps[utts[0].name]
        for spk, utts in utterances.by_speaker().items()}
