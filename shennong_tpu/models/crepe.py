"""The CREPE pitch CNN as a pure-JAX forward pass.

Re-implements the keras model built by the reference
(``shennong/processor/pitch_crepe.py:109-183``): six Conv-BN-MaxPool
blocks over 1024-sample frames followed by a 360-way sigmoid
classifier. Weights are converted once from the published keras ``.h5``
checkpoints into ``.npz`` parameter files (see
:func:`convert_keras_h5`); inference is a single jitted batched
forward on the MXU.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

CAPACITY_MULTIPLIER = {
    'tiny': 4, 'small': 8, 'medium': 16, 'large': 24, 'full': 32}

_LAYER_FILTERS = (32, 4, 4, 4, 8, 16)
_LAYER_WIDTHS = (512, 64, 64, 64, 64, 64)
_LAYER_STRIDES = (4, 1, 1, 1, 1, 1)

_BN_EPSILON = 1e-3  # keras BatchNormalization default

SHARE_DIR = os.path.join(os.path.dirname(__file__), '..', 'share', 'crepe')


def convert_keras_h5(h5_path):
    """Convert a keras CREPE checkpoint to a flat parameter dict.

    Keys: conv{i}/kernel [W, Cin, Cout], conv{i}/bias, conv{i}/{gamma,
    beta, mean, var}, classifier/kernel [256*mult/4? , 360],
    classifier/bias.
    """
    import h5py
    params = {}
    with h5py.File(h5_path, 'r') as fh:
        for i in range(1, 7):
            conv = fh[f'conv{i}']
            sub = conv[list(conv.keys())[0]]
            # keras kernel is [H, W=1, Cin, Cout]; squeeze the W axis
            params[f'conv{i}/kernel'] = np.asarray(
                sub['kernel:0'])[:, 0, :, :]
            params[f'conv{i}/bias'] = np.asarray(sub['bias:0'])

            bn = fh[f'conv{i}-BN']
            sub = bn[list(bn.keys())[0]]
            params[f'conv{i}/gamma'] = np.asarray(sub['gamma:0'])
            params[f'conv{i}/beta'] = np.asarray(sub['beta:0'])
            params[f'conv{i}/mean'] = np.asarray(sub['moving_mean:0'])
            params[f'conv{i}/var'] = np.asarray(
                sub['moving_variance:0'])

        clf = fh['classifier']
        sub = clf[list(clf.keys())[0]]
        params['classifier/kernel'] = np.asarray(sub['kernel:0'])
        params['classifier/bias'] = np.asarray(sub['bias:0'])
    return params


def capacity_of(params):
    """Infer the capacity name from converted parameters."""
    cout = params['conv1/kernel'].shape[-1]
    for name, mult in CAPACITY_MULTIPLIER.items():
        if cout == 32 * mult:
            return name
    raise ValueError(
        f'cannot infer CREPE capacity from conv1 with {cout} filters')


def available_capacities():
    """Capacity names whose converted weights are installed."""
    return tuple(
        name for name in CAPACITY_MULTIPLIER
        if os.path.isfile(os.path.join(
            os.path.abspath(SHARE_DIR), f'model-{name}.npz')))


@functools.lru_cache(maxsize=None)
def load_params(model_capacity):
    """Load the converted npz parameters for a model capacity.

    Looks for ``shennong_tpu/share/crepe/model-<capacity>.npz``.
    Raises RuntimeError when the file is missing (only 'tiny' weights
    ship with the repository; other capacities must be converted from
    the published CREPE checkpoints — the reference itself only ships
    'tiny' in-package and downloads the rest at install time,
    ``shennong/share/README.md``).
    """
    if model_capacity not in CAPACITY_MULTIPLIER:
        raise ValueError(
            f'Model capacity {model_capacity} is not recognized.')
    path = os.path.join(
        os.path.abspath(SHARE_DIR), f'model-{model_capacity}.npz')
    if not os.path.isfile(path):
        installed = ', '.join(available_capacities()) or 'none'
        raise RuntimeError(
            f"CREPE '{model_capacity}' weights are not installed "
            f'(found: {installed}). Convert the published keras '
            f'checkpoint with: speech-features convert-crepe '
            f'model-{model_capacity}.h5 --install '
            f'(checkpoints at github.com/marl/crepe), or pass '
            f'model_capacity=<installed capacity>.')
    with np.load(path) as data:
        return {k: jnp.asarray(v) for k, v in data.items()}


@jax.jit
def forward(params, frames):
    """CREPE forward: [T, 1024] normalized frames -> [T, 360]
    activations."""
    return _forward_body(params, frames)


def _forward_body(params, frames):
    x = frames[:, :, None]  # NWC, one channel

    for i in range(1, 7):
        kernel = params[f'conv{i}/kernel']
        stride = _LAYER_STRIDES[i - 1]
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(stride,), padding='SAME',
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            precision=jax.lax.Precision.HIGHEST)
        x = x + params[f'conv{i}/bias']
        x = jnp.maximum(x, 0.0)
        # batch norm, inference mode
        scale = params[f'conv{i}/gamma'] * jax.lax.rsqrt(
            params[f'conv{i}/var'] + _BN_EPSILON)
        x = (x - params[f'conv{i}/mean']) * scale + params[
            f'conv{i}/beta']
        # max pool (2,) stride 2, valid
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), 'VALID')

    # [T, 4, C] -> flatten (the keras Permute((2,1,3)) is a no-op in
    # memory since the width axis is 1)
    x = x.reshape(x.shape[0], -1)
    logits = x @ params['classifier/kernel'] + params['classifier/bias']
    return jax.nn.sigmoid(logits)


def cents_mapping():
    """Bin index -> cents mapping used by CREPE"""
    return np.linspace(0, 7180, 360) + 1997.3794084376191


def frame_count(nsamples_padded, hop):
    """Model frames of a (center-padded) signal at the given hop.

    Mirrors the reference formula verbatim, including its
    truncation-toward-zero: signals within one hop below 1024
    samples count one (zero-padded) frame.
    """
    return max(0, 1 + int((nsamples_padded - 1024) / hop))


def required_halo(hop):
    """Minimum frame halo for :func:`forward_audio_chunk`.

    The reference normalization has a two-stage forward owner
    dependency: samples of frame f are normalized by statistics of
    frames up to f + K with K = floor(1023 / hop) (the last frame
    covering the sample), and those statistics depend on samples
    whose own owners reach f + 2K. The halo must cover 2K (+1 margin)
    so every referenced frame is complete inside the segment.
    """
    return 2 * (1023 // hop) + 1


def segment_geometry(hop, chunk_frames, halo):
    """(segment_length, left_pad) for :func:`forward_audio_chunk`.

    A segment holds the samples of ``chunk_frames + 2 * halo``
    frames; ``left_pad`` is the sample offset of the chunk's first
    kept frame within the segment.
    """
    npieces, rem = divmod(1024, hop)
    seg_len = (
        chunk_frames + 2 * halo - 1 + npieces) * hop + (rem or hop)
    return seg_len, halo * hop


def _strided_frames(segments, nframes, hop):
    """[B, L] samples -> [B, nframes, 1024] windows at ``hop``, as
    chunk slices (no gather)."""
    npieces, rem = divmod(1024, hop)
    # enough whole tiles for the remainder piece of the last frame
    needed = (nframes + npieces) * hop
    if segments.shape[-1] < needed:
        segments = jnp.pad(
            segments, ((0, 0), (0, needed - segments.shape[-1])))
    tiles = segments[
        :, :segments.shape[-1] // hop * hop].reshape(
        segments.shape[0], -1, hop)
    pieces = [tiles[:, j:j + nframes] for j in range(npieces)]
    if rem:
        pieces.append(tiles[:, npieces:npieces + nframes, :rem])
    return jnp.concatenate(pieces, axis=-1)


@functools.partial(
    jax.jit, static_argnames=('hop', 'chunk_frames', 'halo'))
def forward_audio_chunk(params, segments, last_owner, hop,
                        chunk_frames, halo):
    """Framing + reference normalization + CNN, on device, batched.

    Each row of ``segments`` [B, L] holds the (center-padded) audio
    samples covering frames [f0 - halo, f0 + chunk_frames + halo) of
    one signal, zeros outside the signal; ``last_owner`` [B] is the
    local index of the last real frame (n_global - 1 - f0 + halo, may
    exceed the local range). Rows are either chunks of one long
    signal or whole different utterances. Reproduces the reference's
    in-place overlapping normalization (sample s is normalized by the
    statistics of the last frame covering it, see
    CrepePitchProcessor._model_frames); the halo (at least
    :func:`required_halo` frames) covers the two-stage owner
    dependency so kept frames match the whole-signal computation.

    Returns (salience [B, chunk_frames, 360], stats [B, chunk_frames,
    2] float32 carrying (argmax bin, max salience) in one packed
    fetch payload — bin indices <= 360 are exact in float32, and the
    payload is emitted by THIS program so a slice costs one dispatch
    and one fetch round trip, not a forward dispatch plus a packing
    dispatch plus two fetches). Callers keep the salience on device
    and fetch only the packed statistics.
    """
    # int16-uploaded segments (PCM audio is integer-valued float32,
    # so callers halve the host-device transfer) convert on device
    segments = segments.astype(jnp.float32)
    nlocal = chunk_frames + 2 * halo
    frames0 = _strided_frames(segments, nlocal, hop)
    mean = jnp.mean(frames0, axis=-1)  # [B, nlocal]

    owner = jnp.clip(
        jnp.minimum(jnp.arange(segments.shape[-1])[None, :] // hop,
                    last_owner[:, None]),
        0, nlocal - 1)
    audio1 = segments - jnp.take_along_axis(mean, owner, axis=1)

    frames1 = _strided_frames(audio1, nlocal, hop)
    center = jnp.mean(frames1, axis=-1)
    std = jnp.sqrt(jnp.mean(
        (frames1 - center[..., None]) ** 2, axis=-1))
    audio2 = audio1 / jnp.maximum(
        jnp.take_along_axis(std, owner, axis=1), 1e-38)

    frames = _strided_frames(audio2, nlocal, hop)[
        :, halo:halo + chunk_frames]
    salience = _forward_body(
        params, frames.reshape(-1, 1024)).reshape(
        frames.shape[0], chunk_frames, -1)
    return salience, jnp.stack(
        [jnp.argmax(salience, axis=-1).astype(jnp.float32),
         jnp.max(salience, axis=-1)], axis=-1)


@jax.jit
def gather_neighborhood(salience, centers):
    """salience [n, S], centers [n] -> [n, 9] values at bins
    centers-4 .. centers+4, zeros outside the bin range."""
    idx = centers[:, None] + jnp.arange(-4, 5)[None, :]
    valid = (idx >= 0) & (idx < salience.shape[1])
    vals = jnp.take_along_axis(
        salience, jnp.clip(idx, 0, salience.shape[1] - 1), axis=1)
    return jnp.where(valid, vals, 0.0)


@functools.partial(jax.jit, static_argnames=('viterbi', 'halfwidth'))
def decode_salience_chunk(salience, nframes, log_start, band,
                          uniform_weight, self_weight, mapping,
                          viterbi=True, halfwidth=11):
    """The whole CREPE decode of one slice ON DEVICE, one payload.

    salience [B, T, S] + per-row real lengths -> [B, T, 2] float32
    packing (cents, confidence): the banded Viterbi smoothing (or
    the plain argmax when ``viterbi=False``), the 9-bin neighborhood
    weighted-average cents and the per-frame confidence all run in
    one jitted program, so a slice costs ONE decode dispatch and ONE
    fetch — no per-frame statistics round trip and no host decode on
    the critical path (the opt-in ``decode='device'`` processor mode;
    reference decode: ``crepe/core.py to_viterbi_cents``, host
    float64 twin: ``shennong_tpu/ops/viterbi.py``).
    """
    from shennong_tpu.ops.viterbi import viterbi_banded_obs_batch

    obs = jnp.argmax(salience, axis=-1).astype(jnp.int32)
    confidence = jnp.max(salience, axis=-1)
    if viterbi:
        centers = viterbi_banded_obs_batch(
            log_start, band, uniform_weight, self_weight, obs,
            nframes, halfwidth)
    else:
        centers = obs
    idx = centers[..., None] + jnp.arange(-4, 5)
    valid = (idx >= 0) & (idx < salience.shape[-1])
    cidx = jnp.clip(idx, 0, salience.shape[-1] - 1)
    neigh = jnp.where(
        valid, jnp.take_along_axis(salience, cidx, axis=-1), 0.0)
    map_n = jnp.where(
        valid, jnp.asarray(mapping, jnp.float32)[cidx], 0.0)
    cents = (neigh * map_n).sum(-1) / neigh.sum(-1)
    return jnp.stack([cents, confidence], axis=-1)
