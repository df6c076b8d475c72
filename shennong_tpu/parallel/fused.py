"""Fused production pipelines: whole feature stacks as one XLA program.

This is the serving-path counterpart of the YAML pipeline: the full
MFCC + CMVN + delta + pitch stack compiled into a single jitted
program over a padded utterance batch (no host round-trips between
stages), and a distributed GMM training step whose statistics reduce
with psum over a device mesh.
"""

import functools

import jax
import jax.numpy as jnp

from shennong_tpu.ops import pitch as pitch_ops
from shennong_tpu.ops import postops, spectral


@functools.partial(
    jax.jit,
    static_argnames=('mfcc_opts', 'pitch_opts', 'post_opts',
                     'nframes_max', 'pitch_frames_max', 'delta_order',
                     'delta_window'))
def mfcc_pitch_pipeline(signals, nsamples, mel_weights, mfcc_opts,
                        pitch_opts, post_opts, nframes_max,
                        pitch_frames_max, delta_order=2,
                        delta_window=2, key=None):
    """MFCC + per-utterance CMVN + deltas + Kaldi pitch, fused.

    [B, T] padded signals -> [B, F, 13*(delta_order+1) + pitch_dims]
    feature batch plus the per-utterance frame counts. Mirrors the
    reference's `mfcc --cmvn --delta --pitch kaldi` pipeline with
    per-utterance CMVN normalizing mean AND variance — exactly the
    reference pipeline's pass-2 behavior (CmvnPostProcessor.process
    defaults to norm_vars=True and the reference's own test asserts
    unit output std, test/test_pipeline.py:403-408); every stage is
    fused into one XLA program. A non-zero ``mfcc_opts.frame.dither``
    REQUIRES a ``key`` (the framing kernel raises rather than
    silently skipping a configured dither); set ``dither=0`` for
    deterministic runs.
    """
    feats = spectral.mfcc_batch(
        signals, nsamples, mel_weights, mfcc_opts, nframes_max,
        key=key)

    # per-utterance frame counts, traced (both snip_edges settings)
    shift = mfcc_opts.frame.window_shift
    length = mfcc_opts.frame.window_size
    if mfcc_opts.frame.snip_edges:
        nframes = jnp.maximum((nsamples - length) // shift + 1, 0)
    else:
        nframes = (nsamples + shift // 2) // shift

    # masked per-utterance CMVN (mean + variance)
    t = jnp.arange(feats.shape[1])[None, :, None]
    valid = t < nframes[:, None, None]
    count = jnp.maximum(
        nframes.astype(jnp.float32), 1.0)[:, None, None]
    masked = jnp.where(valid, feats, 0.0)
    mean = jnp.sum(masked, axis=1, keepdims=True) / count
    var = jnp.sum(masked * masked, axis=1, keepdims=True) / count \
        - mean * mean
    feats = jnp.where(
        valid, (feats - mean) * jax.lax.rsqrt(
            jnp.maximum(var, 1e-20)), 0.0)

    # deltas
    feats = postops.compute_deltas(
        feats, nframes, order=delta_order, window=delta_window)

    # pitch + post-processing
    raw_pitch = pitch_ops.compute_pitch(
        signals, nsamples, pitch_opts, pitch_frames_max)
    pitch_feats = pitch_ops.process_pitch(
        raw_pitch, pitch_ops.pitch_num_frames_device(
            _resampled_len(nsamples, pitch_opts), pitch_opts),
        post_opts)

    # concatenate on the common frame grid; like the reference's
    # trim-to-shortest (2-frame tolerance), the per-utterance valid
    # count is the minimum of the MFCC and pitch frame counts so no
    # row carries padding-derived pitch values
    pitch_frames = pitch_ops.pitch_num_frames_device(
        _resampled_len(nsamples, pitch_opts), pitch_opts)
    common = min(feats.shape[1], pitch_feats.shape[1])
    out = jnp.concatenate(
        [feats[:, :common], pitch_feats[:, :common]], axis=-1)
    out_frames = jnp.minimum(jnp.minimum(nframes, pitch_frames), common)
    return out, out_frames


def _resampled_len(nsamples, opts):
    import math as _math
    gcd = _math.gcd(int(opts.sample_rate), int(opts.resample_freq))
    out_r = int(opts.resample_freq) // gcd
    in_r = int(opts.sample_rate) // gcd
    prod = nsamples.astype(jnp.int32) * out_r
    last = prod // in_r
    exact = (last * in_r == prod)
    return (last - exact.astype(jnp.int32) + 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=('kind', 'feat_opts', 'energy_opts', 'compression',
                     'vad_opts', 'pitch_opts', 'post_opts',
                     'nframes_max', 'pitch_frames_max', 'with_noise'))
def pass_one_program(signals, nsamples, mel_weights, equal_loudness,
                     kind, feat_opts, nframes_max, energy_opts=None,
                     compression='log', vad_opts=None, pitch_opts=None,
                     post_opts=None, pitch_frames_max=None,
                     with_noise=False, key=None):
    """The whole pipeline pass 1 for one utterance batch, fused.

    One XLA program computes everything pass 1 needs from a padded
    signal batch: the frame features (MFCC / filterbank / PLP /
    spectrogram), the energy-based VAD decisions feeding CMVN
    accumulation, and the post-processed Kaldi pitch. The reference
    runs these as separate per-utterance joblib tasks
    (``shennong/pipeline.py:545-565``); the first rebuild ran them as
    separate batched sweeps, which re-uploaded every signal once per
    stage — through a thin host-device link the transfer, not the
    compute, dominates, so pass 1 is one signal upload and one
    dispatch per batch.

    ``signals`` may be int16 (uploads at half the bytes of float32
    when the decoded audio is integer-valued, which PCM WAV always
    is); the cast to float32 happens on device.

    Returns a dict with ``feats`` [B, F, D] and, when the
    corresponding opts are given, ``vad`` [B, F] uint8 and ``pitch``
    [B, Fp, P]. Frame counts are recomputed host-side from nsamples.
    """
    from shennong_tpu.ops import plp as plp_ops
    from shennong_tpu.ops import postops

    signals = signals.astype(jnp.float32)

    if key is not None:
        key_feat, key_energy, key_noise = jax.random.split(key, 3)
    else:
        key_feat = key_energy = key_noise = None

    if kind == 'mfcc':
        feats = spectral.mfcc_batch(
            signals, nsamples, mel_weights, feat_opts, nframes_max,
            key=key_feat)
    elif kind == 'filterbank':
        feats = spectral.fbank_batch(
            signals, nsamples, mel_weights, feat_opts, nframes_max,
            key=key_feat)
    elif kind == 'plp':
        feats = plp_ops.plp_batch(
            signals, nsamples, mel_weights, equal_loudness, feat_opts,
            nframes_max, key=key_feat)
    elif kind == 'spectrogram':
        feats = spectral.spectrogram_batch(
            signals, nsamples, feat_opts, nframes_max, key=key_feat)
    else:
        raise ValueError(f'unsupported fused pass-1 features: {kind}')
    out = {'feats': feats}

    if energy_opts is not None:
        log_energy = spectral.energy_batch(
            signals, nsamples, energy_opts, nframes_max,
            compression=compression, key=key_energy)
        shift = energy_opts.frame.window_shift
        length = energy_opts.frame.window_size
        if energy_opts.frame.snip_edges:
            nframes = jnp.maximum((nsamples - length) // shift + 1, 0)
        else:
            nframes = (nsamples + shift // 2) // shift
        threshold, mean_scale, context, proportion = vad_opts
        out['vad'] = postops.compute_vad_energy(
            log_energy, nframes, energy_threshold=threshold,
            energy_mean_scale=mean_scale, frames_context=context,
            proportion_threshold=proportion)

    if pitch_opts is not None:
        raw_pitch = pitch_ops.compute_pitch(
            signals, nsamples, pitch_opts, pitch_frames_max)
        pitch_frames = pitch_ops.pitch_num_frames_device(
            _resampled_len(nsamples, pitch_opts), pitch_opts)
        noise = None
        if with_noise:
            noise = jax.random.normal(
                key_noise, raw_pitch.shape[:2], dtype=jnp.float32)
        out['pitch'] = pitch_ops.process_pitch(
            raw_pitch, pitch_frames, post_opts, noise=noise)

    return out


@functools.partial(jax.jit, static_argnames=('dtype',))
def pack_payload(parts, dtype='float32'):
    """Pack device arrays into ONE contiguous uint8 fetch payload.

    Every separate device->host fetch pays a full relay round trip
    (~35-50 ms observed), so the pipeline's per-batch outputs (feats,
    VAD, pitch) are byte-packed on device and fetched as a single
    array. ``dtype`` optionally downcasts the float parts before
    packing ('float16'/'bfloat16' halve the fetched bytes — opt-in:
    the default 'float32' is bit-exact). uint8 parts (VAD) pass
    through unchanged. Hosts unpack with zero-copy numpy views
    (byte layout = C-order little-endian, matching ``ndarray.view``).

    Replaces the per-array fetches of the reference's joblib workers
    (each worker returns its own numpy arrays through the pool,
    ``shennong/pipeline.py:545-565``).
    """
    target = jnp.dtype(dtype)
    chunks = []
    for arr in parts:
        if arr.dtype == jnp.uint8:
            chunks.append(arr.reshape(-1))
            continue
        if target != arr.dtype:
            arr = arr.astype(target)
        chunks.append(
            jax.lax.bitcast_convert_type(arr, jnp.uint8).reshape(-1))
    return jnp.concatenate(chunks)


@functools.partial(
    jax.jit,
    static_argnames=('mfcc_opts', 'nframes_max', 'delta_order',
                     'delta_window', 'vad_opts', 'cmvn_opts',
                     'subsample'))
def ubm_frontend_program(signals, nsamples, mel_weights, mfcc_opts,
                         nframes_max, delta_order, delta_window,
                         vad_opts, cmvn_opts, subsample, key=None):
    """The whole UBM-GMM feature front-end, fused per signal batch.

    One XLA program computes everything the UBM trainer needs from a
    padded signal batch: MFCC, delta appending, the energy-VAD
    decisions on the feature energy column, sliding-window CMVN, and
    the two frame-selection weight vectors (voiced frames for
    initialization, voiced-and-subsampled frames for the main EM,
    Kaldi's trim-then-every-Nth-row semantics). The previous staged
    path round-tripped the corpus features through the host-device
    link three times (extract, VAD, sliding CMVN) before uploading
    them a fourth time for EM; this keeps them on the device end to
    end (reference: the pykaldi calls in
    ``shennong/processor/ubm.py:714-772``).

    Returns (normalized feats [B, F, D'], w_init [B, F] float32,
    w_em [B, F] float32, voiced [] float32 — the batch's total voiced
    count, a cheap per-batch sync probe) — all device-resident.
    """
    signals = signals.astype(jnp.float32)
    feats = spectral.mfcc_batch(
        signals, nsamples, mel_weights, mfcc_opts, nframes_max,
        key=key)

    shift = mfcc_opts.frame.window_shift
    length = mfcc_opts.frame.window_size
    if mfcc_opts.frame.snip_edges:
        nframes = jnp.maximum((nsamples - length) // shift + 1, 0)
    else:
        nframes = (nsamples + shift // 2) // shift

    log_energy = feats[..., 0]
    if delta_order is not None:
        feats = postops.compute_deltas(
            feats, nframes, order=delta_order, window=delta_window)

    threshold, mean_scale, context, proportion = vad_opts
    vad = postops.compute_vad_energy(
        log_energy, nframes, energy_threshold=threshold,
        energy_mean_scale=mean_scale, frames_context=context,
        proportion_threshold=proportion)

    if cmvn_opts is not None:
        center, window, min_window, normalize_variance = cmvn_opts
        feats = postops.sliding_window_cmvn(
            feats, nframes, center=center, cmn_window=window,
            min_window=min_window,
            normalize_variance=normalize_variance)

    t = jnp.arange(feats.shape[1])[None, :]
    valid = t < nframes[:, None]
    voiced = valid & (vad > 0)
    w_init = voiced.astype(jnp.float32)
    # per-utterance voiced rank: trim(vad) then copy(subsample=N)
    # keeps every Nth row of each trimmed utterance
    rank = jnp.cumsum(w_init, axis=1) - 1.0
    w_em = w_init * (jnp.mod(rank, float(subsample)) == 0)
    return feats, w_init, w_em, jnp.sum(w_init)


def make_gmm_training_step(mesh, mfcc_opts, nframes_max):
    """A distributed GMM EM step over a data-parallel mesh.

    Returns a function (signals, nsamples, weights, means, inv_vars)
    -> updated (weights, means, inv_vars): each device extracts MFCC
    for its shard of utterances and accumulates EM statistics; the
    statistics psum over the 'data' axis before the on-device MLE
    update (the TPU-native equivalent of the reference's multithreaded
    C++ accumulation, ``shennong/processor/ubm.py:656``).

    A non-zero ``mfcc_opts.frame.dither`` changes the signature: the
    returned function takes a trailing PRNG ``key`` argument (the
    framing kernel refuses to silently skip a configured dither);
    fold a step counter into the key between calls for fresh noise.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from shennong_tpu.ops import gmm as gmm_ops
    from shennong_tpu.ops import mel as melmod

    mel_weights = jnp.asarray(melmod.mel_banks(
        mfcc_opts.mel.num_bins, mfcc_opts.frame.padded_window_size,
        mfcc_opts.frame.sample_rate, mfcc_opts.mel.low_freq,
        mfcc_opts.mel.high_freq, mfcc_opts.mel.vtln_low,
        mfcc_opts.mel.vtln_high, 1.0)[0])
    dithered = mfcc_opts.frame.dither != 0.0

    def shard_step(signals, nsamples, weights, means, inv_vars,
                   key=None):
        if key is not None:
            # independent dither noise per shard: the replicated key
            # would otherwise draw the SAME pattern on every device
            key = jax.random.fold_in(key, jax.lax.axis_index('data'))
        feats = spectral.mfcc_batch(
            signals, nsamples, mel_weights, mfcc_opts, nframes_max,
            key=key)

        shift = mfcc_opts.frame.window_shift
        length = mfcc_opts.frame.window_size
        nframes = jnp.maximum((nsamples - length) // shift + 1, 0)
        t = jnp.arange(feats.shape[1])[None, :]
        frame_weights = (t < nframes[:, None]).astype(jnp.float32)

        flat = feats.reshape(-1, feats.shape[-1])
        flat_weights = frame_weights.reshape(-1)
        _, occ, mean_acc, var_acc = gmm_ops.accumulate_stats(
            flat, flat_weights, weights, means, inv_vars)

        # global statistics ride the ICI
        occ = jax.lax.psum(occ, 'data')
        mean_acc = jax.lax.psum(mean_acc, 'data')
        var_acc = jax.lax.psum(var_acc, 'data')

        # on-device MLE update (no floors: the dryrun/training hot path)
        total = jnp.sum(occ)
        new_weights = occ / total
        safe = jnp.maximum(occ, 1e-10)[:, None]
        new_means = mean_acc / safe
        new_vars = jnp.maximum(
            var_acc / safe - new_means ** 2, 1e-3)
        return new_weights, new_means, 1.0 / new_vars

    if dithered:
        return jax.jit(shard_map(
            shard_step, mesh=mesh,
            in_specs=(P('data'), P('data'), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_rep=False))

    def undithered_step(signals, nsamples, weights, means, inv_vars):
        return shard_step(signals, nsamples, weights, means, inv_vars)

    return jax.jit(shard_map(
        undithered_step, mesh=mesh,
        in_specs=(P('data'), P('data'), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False))


def make_em_train_steps(mesh, num_iters, min_gaussian_weight=1e-4,
                        min_gaussian_occupancy=10.0, min_variance=0.001):
    """``num_iters`` fused EM iterations over a data-parallel mesh.

    Returns a function (flat, fweights, weights, means, inv_vars) ->
    (tot_like, weights, means, inv_vars): the frame axis of ``flat``
    [N, D] / ``fweights`` [N] is sharded over the mesh's ``'data'``
    axis (padding rows carry zero weight), the model is replicated;
    each iteration accumulates local statistics, psums them over the
    mesh and applies the same floored MLE update as
    :func:`shennong_tpu.ops.gmm.em_step` on every device. One compiled
    program covers the whole run — the multi-host twin of the
    single-device ``em_steps`` fusion (the reference fans this out as
    per-SLURM-task accumulators merged through the filesystem,
    ``shennong/processor/ubm.py:656``).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from shennong_tpu.ops import gmm as gmm_ops

    def shard_steps(flat, fweights, weights, means, inv_vars):
        def body(_, carry):
            _, w_, m_, iv_ = carry
            return gmm_ops.em_step(
                flat, fweights, w_, m_, iv_,
                min_gaussian_weight=min_gaussian_weight,
                min_gaussian_occupancy=min_gaussian_occupancy,
                min_variance=min_variance, axis_name='data')

        init = (jnp.float32(0.0), weights, means, inv_vars)
        return jax.lax.fori_loop(0, num_iters, body, init)

    return jax.jit(shard_map(
        shard_steps, mesh=mesh,
        in_specs=(P('data'), P('data'), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False))


def make_accumulate_step(mesh):
    """Mesh-wide EM statistic accumulation (for host-side updates).

    Returns (flat, fweights, weights, means, inv_vars) -> (tot_like,
    occupancy, mean_acc, var_acc) with the frame axis sharded over
    ``'data'`` and the statistics psum'd — the distributed final
    iteration of UBM training, whose component-removing update must
    run on the host (shapes change).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from shennong_tpu.ops import gmm as gmm_ops

    def shard_acc(flat, fweights, weights, means, inv_vars):
        like, occ, mean_acc, var_acc = gmm_ops.accumulate_stats(
            flat, fweights, weights, means, inv_vars)
        return (jax.lax.psum(like, 'data'),
                jax.lax.psum(occ, 'data'),
                jax.lax.psum(mean_acc, 'data'),
                jax.lax.psum(var_acc, 'data'))

    return jax.jit(shard_map(
        shard_acc, mesh=mesh,
        in_specs=(P('data'), P('data'), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False))


def make_lvtln_round_step(mesh, num_groups, num_gselect=15,
                          norm_type='offset', logdet_scale=0.0,
                          default_class=0):
    """One distributed LVTLN estimation round over a data-parallel mesh.

    Returns a function (feats, fweights, gid, base, warps, gmm_weights,
    gmm_means, gmm_inv_vars) -> (transforms [S, D, D+1], warps_out [S],
    best_class [S], objf_impr [S], beta [S]): each device selects
    gaussians and computes posteriors for its shard of frames, the
    per-group fMLLR statistics psum over the mesh, and every device
    solves the identical per-(group, warp-class) objective — the
    distributed twin of one ``lvtln_rounds`` estimation round (the
    reference fans the same round out over SLURM tasks,
    ``examples/vtln_training/run.sh:16-23``).

    ``feats`` [N, D] / ``fweights`` [N] / ``gid`` [N] are sharded over
    ``'data'``; the warp-class bases and the GMM are replicated.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from shennong_tpu.ops import fmllr as fmllr_ops
    from shennong_tpu.ops import gmm as gmm_ops

    def shard_round(feats, fweights, gid, base, warps,
                    weights, means, inv_vars):
        _, gsel = gmm_ops.gaussian_selection(
            feats, weights, means, inv_vars, num_gselect)
        _, post = gmm_ops.posteriors_preselect(
            feats, gsel, weights, means, inv_vars)
        post = post * fweights[:, None]

        beta, K, G = fmllr_ops.fmllr_stats_groups(
            feats, gsel, post, gid, means, inv_vars, num_groups)
        beta = jax.lax.psum(beta, 'data')
        K = jax.lax.psum(K, 'data')
        G = jax.lax.psum(G, 'data')

        sign_b, logdet_base = jnp.linalg.slogdet(base)
        valid_base = sign_b > 0
        logdet_base = jnp.where(valid_base, logdet_base, 0.0)
        return fmllr_ops.solve_warp_classes(
            beta, K, G, base, warps, valid_base, logdet_base,
            norm_type=norm_type, logdet_scale=logdet_scale,
            default_class=default_class)

    return jax.jit(shard_map(
        shard_round, mesh=mesh,
        in_specs=(P('data'), P('data'), P('data'), P(), P(), P(),
                  P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_rep=False))


def make_lvtln_train_steps(mesh, num_groups, num_iters,
                           norm_type='offset', logdet_scale=0.0,
                           default_class=0, min_gaussian_weight=1e-4):
    """The WHOLE LVTLN estimation loop over a data-parallel mesh.

    Returns a function (feats, fweights, gid, gsel, base, warps,
    gmm_weights, gmm_means, gmm_inv_vars) -> the ``lvtln_rounds``
    outputs: the frame axis (first four arguments) shards over the
    mesh's ``'data'`` axis, everything else replicates, and every
    round's fMLLR statistics and EM accumulators psum across all
    devices of all processes — one compiled program for the full
    ``num_iters`` training loop, the multi-host twin of
    :func:`shennong_tpu.ops.fmllr.lvtln_rounds` (the reference fans
    this loop out as SLURM tasks merging through the filesystem,
    ``examples/vtln_training/run.sh:16-23``).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from shennong_tpu.ops import fmllr as fmllr_ops

    def shard_rounds(feats, fweights, gid, gsel, base, warps,
                     weights, means, inv_vars):
        return fmllr_ops.lvtln_rounds(
            feats, fweights, gid, gsel, base, warps,
            weights, means, inv_vars,
            num_groups=num_groups, num_iters=num_iters,
            norm_type=norm_type, logdet_scale=logdet_scale,
            default_class=default_class,
            min_gaussian_weight=min_gaussian_weight,
            axis_name='data')

    return jax.jit(shard_map(
        shard_rounds, mesh=mesh,
        in_specs=(P('data'), P('data'), P('data'), P('data'),
                  P(), P(), P(), P(), P()),
        out_specs=(P(),) * 8,
        check_rep=False))
