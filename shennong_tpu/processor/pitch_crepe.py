"""CREPE pitch extraction and post-processing.

API-compatible with ``shennong/processor/pitch_crepe.py``; the CNN
runs as a jitted JAX forward pass (:mod:`shennong_tpu.models.crepe`)
and the Viterbi smoothing / voicing decisions use
:mod:`shennong_tpu.ops.viterbi` instead of hmmlearn. The POV-to-NCCF
inversion is vectorized through a dense monotonic interpolation table
rather than a per-frame bisection loop.
"""

import copy
import functools
import warnings

import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from shennong_tpu import Features
from shennong_tpu.models import crepe
from shennong_tpu.ops.viterbi import (
    viterbi_host_banded, viterbi_host_banded_obs)
from shennong_tpu.processor.base import FeaturesProcessor
from shennong_tpu.processor.pitch_kaldi import KaldiPitchPostProcessor


def _to_local_average_cents(salience, centers):
    """Weighted average of cents around the given center bins."""
    mapping = crepe.cents_mapping()
    out = np.zeros(len(centers))
    for i, center in enumerate(centers):
        start = max(0, int(center) - 4)
        end = min(salience.shape[1], int(center) + 5)
        weights = salience[i, start:end]
        out[i] = np.sum(weights * mapping[start:end]) / np.sum(weights)
    return out


def _local_average_from_neighborhoods(neigh, centers):
    """:func:`_to_local_average_cents` from 9-bin neighborhoods.

    ``neigh[i, d]`` holds salience[i, centers[i] - 4 + d] with zeros
    outside the bin range (see crepe.gather_neighborhood); same
    values as the full-salience routine, vectorized.
    """
    mapping = crepe.cents_mapping()
    idx = centers[:, None].astype(np.int64) + np.arange(-4, 5)
    valid = (idx >= 0) & (idx < mapping.shape[0])
    map_n = np.where(
        valid, mapping[np.clip(idx, 0, mapping.shape[0] - 1)], 0.0)
    with np.errstate(invalid='ignore', divide='ignore'):
        return (neigh * map_n).sum(axis=1) / neigh.sum(axis=1)


class _DeviceSalience:
    """CREPE salience chunks kept on device, with host statistics.

    The decode needs only the per-frame argmax bin, the per-frame
    maximum (confidence) and a 9-bin neighborhood around the decoded
    path — fetching those instead of the full [n, 360] matrix turns a
    ~100 MB host transfer per 10 minutes of audio into ~1 MB.
    """

    def __init__(self, chunks, counts, argmax, amax):
        self.chunks = chunks    # [chunk_frames, 360] device arrays
        self.counts = counts    # kept frames per chunk
        self.argmax = argmax    # [n] per-frame argmax bin (host)
        self.amax = amax        # [n] per-frame max salience (host)

    def neighborhoods(self, centers):
        """[n, 9] salience values around per-frame center bins,
        zeros outside the bin range."""
        import concurrent.futures

        pending, lo = [], 0
        with concurrent.futures.ThreadPoolExecutor(4) as fetch_pool:
            for sal, keep in zip(self.chunks, self.counts):
                c = np.zeros(sal.shape[0], np.int32)
                c[:keep] = centers[lo:lo + keep]
                # dispatch all gathers before fetching any; the
                # fetches overlap each other on the pool
                pending.append(fetch_pool.submit(
                    np.asarray,
                    crepe.gather_neighborhood(sal, jnp.asarray(c))))
                lo += keep
            if not pending:
                return np.zeros((0, 9), np.float32)
            return np.concatenate([
                fut.result()[:keep]
                for fut, keep in zip(pending, self.counts)])


def _crepe_prior(nstates):
    """(start, transition, emission) of the CREPE smoothing HMM."""
    start = np.full(nstates, 1.0 / nstates)

    grid = np.arange(nstates)
    transition = np.maximum(12 - np.abs(grid[:, None] - grid[None, :]), 0)
    transition = transition / transition.sum(axis=1, keepdims=True)

    self_emission = 0.1
    emission = (np.eye(nstates) * self_emission
                + (1 - self_emission) / nstates)
    return start, transition, emission


@functools.lru_cache(maxsize=4)
def _crepe_prior_logs(nstates):
    """Cached log-domain prior pieces for :func:`_viterbi_bin_path`.

    The prior depends only on the state count, but building the
    [S, S] matrices, their logs and the transition band cost ~4 ms —
    once per decoded ROW that is 10% of a warm corpus run."""
    from shennong_tpu.ops.viterbi import _band_matrix

    start, transition, emission = _crepe_prior(nstates)
    with np.errstate(divide='ignore'):
        log_trans = np.log(transition)
        return (np.log(start), log_trans,
                float(np.log(emission[1, 0])),
                float(np.log(emission[0, 0])),
                _band_matrix(log_trans, 11))


def _to_viterbi_cents(salience):
    """Viterbi-smoothed cents decode (360-state banded prior)."""
    observations = np.argmax(salience, axis=1)
    path = _viterbi_bin_path(observations, salience.shape[1])
    return _to_local_average_cents(salience, path)


def _viterbi_bin_path(observations, nstates):
    """Decode the smoothed bin path from the argmax bin sequence.

    The transition prior is banded (halfwidth 11), so the banded
    decoder applies — bit-identical to the dense one at 1/16 the
    work.
    """
    (log_start, log_trans, uniform_w, self_w,
     band) = _crepe_prior_logs(nstates)
    # emission columns are two-valued (self bin vs uniform), so the
    # decoder takes the argmax sequence plus the two log weights and
    # never builds the [T, S] observation matrix
    return viterbi_host_banded_obs(
        log_start, log_trans, observations, uniform_w, self_w, 11,
        band=band)


def _nccf_to_pov(x):
    """From Normalized Cross Correlation to Probability of Voicing"""
    y = (-5.2 + 5.4 * np.exp(7.5 * (x - 1)) + 4.8 * x
         - 2 * np.exp(-10 * x) + 4.2 * np.exp(20 * (x - 1)))
    return 1 / (1 + np.exp(-y))


def _pov_to_nccf(pov):
    """Inverse of :func:`_nccf_to_pov` on [0, 1], vectorized.

    The mapping is strictly increasing on [0, 1]; invert it by
    interpolation on a dense grid (replacing the reference's per-frame
    scipy bisection at ``pitch_crepe.py:594-601``).
    """
    grid = np.linspace(0.0, 1.0, 4097)
    values = _nccf_to_pov(grid)
    return np.interp(pov, values, grid)


def predict_voicing(confidence):
    """Viterbi-smoothed voiced/unvoiced decision from confidence.

    A 2-state HMM with gaussian emissions (means 0 and 1, variance
    0.25) and sticky transitions; returns 0/1 per frame.
    """
    means = np.array([0.0, 1.0])
    variance = 0.25
    log_obs = (
        -0.5 * ((confidence[:, None] - means[None, :]) ** 2 / variance
                + np.log(2 * np.pi * variance)))
    log_start = np.log(np.array([0.5, 0.5]))
    log_trans = np.log(np.array([[0.99, 0.01], [0.01, 0.99]]))
    # halfwidth 1 covers the whole 2x2 transition matrix, so the
    # banded decoder (native kernel when available) is exact
    return viterbi_host_banded(log_start, log_trans, log_obs, 1)


class CrepePitchProcessor(FeaturesProcessor):
    """Extracts the (POV, pitch) per frame from a speech signal

    This processor uses the pre-trained CREPE model. The output will have as
    many rows as there are frames, and two columns corresponding to (POV,
    pitch). POV is the Probability of Voicing.

    """

    # frames per CNN device program; longer signals run in chunks of
    # this many frames (bounds the first conv layer's ~128 KB/frame
    # activation footprint)
    CHUNK_FRAMES = 8192

    def __init__(self, model_capacity='full', viterbi=True, center=True,
                 frame_shift=0.01, frame_length=0.025, decode='host'):
        super().__init__()
        self.model_capacity = model_capacity
        self.viterbi = viterbi
        self.center = center
        self.frame_shift = frame_shift
        self.frame_length = frame_length
        self.decode = decode

    @property
    def name(self):
        return 'crepe'

    @property
    def model_capacity(self):
        """String specifying the model capacity to use

        Must be 'tiny', 'small', 'medium', 'large' or 'full' (the
        default, as in the reference,
        ``shennong/processor/pitch_crepe.py:302``). Only the 'tiny'
        weights ship with the package; other capacities must be
        converted once from the published CREPE checkpoints with
        ``speech-features convert-crepe`` (processing raises a clear
        RuntimeError when the requested weights are not installed).

        """
        return self._model_capacity

    @model_capacity.setter
    def model_capacity(self, value):
        if value not in crepe.CAPACITY_MULTIPLIER:
            raise ValueError(
                f'Model capacity {value} is not recognized.')
        self._model_capacity = value

    @property
    def viterbi(self):
        """Whether to apply viterbi smoothing to the estimated pitch curve"""
        return self._viterbi

    @viterbi.setter
    def viterbi(self, value):
        self._viterbi = bool(value)

    @property
    def center(self):
        """Whether to center the window on the current frame.

        When True, the output frame :math:`t` is centered at `audio[t *
        hop_length]`. When False, the frame begins at `audio[t * hop_length]`.

        """
        return self._center

    @center.setter
    def center(self, value):
        self._center = bool(value)

    @property
    def decode(self):
        """Where the bin decode runs: 'host' or 'device'.

        'host' (the default) runs the Viterbi smoothing and the cents
        averaging on the host in float64 — bit-identical to the
        reference's hmmlearn tie-breaking. 'device' (a TPU-native
        extension, not a reference parameter) runs the whole decode —
        banded Viterbi, neighborhood cents, confidence — inside one
        jitted program on the accelerator, so a corpus slice costs
        one dispatch and one fetch with no host decode on the
        critical path; float32 forward scores resolve near-tie
        plateaus differently from the float64 host decode (measured
        on the TPU: 1-5% of frames shift by one 20-cent bin, <= ~2 Hz;
        confidences identical). Use when freeing the host and
        minimizing round trips matters more than bit-exact reference
        parity — e.g. sharded multi-chip serving, where the decode
        shards over utterance rows like the CNN. Applies to the
        batched whole-utterance ``process_all`` path; utterances
        beyond ``CHUNK_FRAMES`` frames decode chunk-globally and keep
        the host path.
        """
        return self._decode_mode

    @decode.setter
    def decode(self, value):
        if value not in ('host', 'device'):
            raise ValueError(
                f"decode must be 'host' or 'device', got {value}")
        self._decode_mode = value

    @property
    def frame_shift(self):
        """"Frame shift in seconds for running pitch estimation"""
        return self._frame_shift

    @frame_shift.setter
    def frame_shift(self, value):
        self._frame_shift = value

    @property
    def frame_length(self):
        """Frame length in seconds"""
        return self._frame_length

    @frame_length.setter
    def frame_length(self, value):
        self._frame_length = value

    @property
    def sample_rate(self):
        """CREPE operates at 16kHz"""
        return 16000

    @property
    def ndims(self):
        return 2

    def times(self, nframes):
        """Returns the time label for the rows given by :func:`process`"""
        return np.vstack((
            np.arange(nframes) * self.frame_shift,
            np.arange(nframes) * self.frame_shift + self.frame_length)).T

    def _model_frames(self, audio):
        """Normalized 1024-sample model input frames of one signal.

        The reference normalizes in place *through an overlapping
        strided view* of the audio buffer
        (``shennong/processor/pitch_crepe.py:410-421`` drops the
        ``.copy()`` that upstream crepe has), so each write-back of a
        normalized frame overwrites the head of every earlier
        overlapping frame.  Numpy resolves such self-overlapping
        in-place ufuncs as copy-compute-writeback in C order, i.e.
        sample ``s`` ends up normalized with the statistics of the
        *last* frame covering it.  We reproduce that closed form
        vectorized (frame ``min(n-1, s // hop)`` owns sample ``s``) so
        outputs match the reference bit-for-bit.
        """
        audio = audio.astype(np.float32)
        if self.center:
            audio = np.pad(audio, 512, mode='constant')

        hop = int(16000 * self.frame_shift)
        n_frames = crepe.frame_count(len(audio), hop)
        if n_frames == 0:
            return np.zeros((0, 1024), dtype=np.float32)

        def strided(buf):
            return np.lib.stride_tricks.as_strided(
                buf, shape=(n_frames, 1024),
                strides=(hop * buf.itemsize, buf.itemsize)).copy()

        # frame owning each sample after the C-order write-back
        covered = (n_frames - 1) * hop + 1024
        owner = np.minimum(n_frames - 1, np.arange(covered) // hop)

        frames = strided(audio)
        mean = frames.mean(axis=1)
        audio[:covered] -= mean[owner]
        frames = strided(audio)
        std = frames.std(axis=1)
        audio[:covered] /= np.maximum(std[owner], 1e-38)
        return strided(audio)

    def _forward(self, frames):
        """CNN forward over [n, 1024] frames, padded to a bucket so
        the network compiles once per bucket, not once per count."""
        from shennong_tpu.ops.framing import bucket_size
        params = crepe.load_params(self.model_capacity)
        n_frames = frames.shape[0]
        bucket = bucket_size(n_frames, minimum=128)
        if bucket > n_frames:
            frames = np.pad(frames, ((0, bucket - n_frames), (0, 0)))
        activation = np.asarray(
            crepe.forward(params, jnp.asarray(frames)))
        return activation[:n_frames]

    def _get_activation(self, audio):
        """The CNN activation matrix [nframes, 360]."""
        return self._forward(self._model_frames(audio))

    def _device_salience(self, audio):
        """Framing + normalization + CNN fully on device, chunked.

        Uploads the raw audio (not the 6.4x-overlapping frame matrix)
        and keeps the [n, 360] salience on device; only per-frame
        argmax/max statistics come back to the host. Returns a
        :class:`_DeviceSalience` or None when the signal is shorter
        than one model window.

        Every chunk's salience stays alive on device until the decode
        has gathered its path neighborhoods (~5.6 MB per minute of
        audio at the default shift) — day-scale recordings should be
        processed in segments.
        """
        audio = np.ascontiguousarray(audio, dtype=np.float32)
        if self.center:
            audio = np.pad(audio, 512, mode='constant')
        hop = int(16000 * self.frame_shift)
        nframes = crepe.frame_count(len(audio), hop)
        if nframes == 0:
            return None

        from shennong_tpu.ops.framing import bucket_size
        halo = crepe.required_halo(hop)
        cap = self.CHUNK_FRAMES
        chunk = (cap if nframes > cap
                 else bucket_size(nframes, minimum=128))
        params = crepe.load_params(self.model_capacity)

        seg_len, pad_left = crepe.segment_geometry(hop, chunk, halo)
        last_start = (nframes - 1) // chunk * chunk * hop
        buf = np.zeros(
            max(pad_left + len(audio), last_start + seg_len),
            np.float32)
        buf[pad_left:pad_left + len(audio)] = audio
        # PCM audio is integer-valued float32: upload each chunk at
        # half the bytes (the jitted forward converts on device)
        from shennong_tpu.parallel.stream import as_int16_if_lossless
        buf = as_int16_if_lossless(buf)

        # dispatch every chunk before fetching anything: uploads and
        # CNN programs overlap under JAX's async dispatch. The
        # argmax/max statistics travel as one packed payload per
        # chunk, fetched on a thread pool so the relay round trips of
        # consecutive chunks overlap each other
        import concurrent.futures

        chunks, counts, pending = [], [], []
        with concurrent.futures.ThreadPoolExecutor(4) as fetch_pool:
            for f0 in range(0, nframes, chunk):
                segment = jnp.asarray(
                    buf[f0 * hop:f0 * hop + seg_len])[None]
                owner = jnp.full(
                    (1,), nframes - 1 - f0 + halo, jnp.int32)
                sal, packed = crepe.forward_audio_chunk(
                    params, segment, owner, hop, chunk, halo)
                chunks.append(sal[0])
                counts.append(min(chunk, nframes - f0))
                pending.append(fetch_pool.submit(np.asarray, packed))
            stats = [fut.result() for fut in pending]
        argm = [s[0, :keep, 0].astype(np.int32)
                for s, keep in zip(stats, counts)]
        amax = [np.ascontiguousarray(s[0, :keep, 1])
                for s, keep in zip(stats, counts)]
        return _DeviceSalience(
            chunks, counts, np.concatenate(argm), np.concatenate(amax))

    def _check_audio(self, audio):
        """Mono check + transparent resampling to the model rate."""
        if audio.nchannels != 1:
            raise ValueError(
                f'audio must have one channel but has {audio.nchannels}')
        if audio.sample_rate != self.sample_rate:
            self.log.debug('resampling audio to 16 kHz')
            audio = audio.resample(self.sample_rate)
        return audio

    def process_all(self, utterances, njobs=None, **kwargs):
        """Batched extraction over an utterance collection.

        Utterances are grouped into frame-count buckets; each group
        runs framing + normalization + CNN as one batched device
        program over the raw audio, and only per-frame statistics
        plus the decoded-path neighborhoods return to the host (the
        Viterbi smoothing and grid resampling stay host-side).
        Utterances past ``CHUNK_FRAMES`` frames take the chunked
        single-utterance path.
        """
        if kwargs:
            return super().process_all(utterances, njobs=njobs, **kwargs)

        from shennong_tpu import FeaturesCollection
        from shennong_tpu.ops.framing import bucket_size

        hop = int(16000 * self.frame_shift)
        halo = crepe.required_halo(hop)
        collection = FeaturesCollection()

        groups = {}  # bucket -> [(name, nsamples, padded, nframes)]
        for utt in utterances:
            audio = self._check_audio(utt.load_audio())
            data = np.ascontiguousarray(audio.data, dtype=np.float32)
            if self.center:
                data = np.pad(data, 512, mode='constant')
            nframes = crepe.frame_count(len(data), hop)
            if nframes == 0:
                collection[utt.name] = self._finish_decode(
                    None, None, audio.shape[0])
            elif nframes > self.CHUNK_FRAMES:
                collection[utt.name] = self._decode_salience(
                    self._device_salience(audio.data), audio.shape[0])
            else:
                groups.setdefault(
                    bucket_size(nframes, minimum=128), []).append(
                    (utt.name, audio.shape[0], data, nframes))
        if not groups:
            return collection

        params = crepe.load_params(self.model_capacity)

        # pipelined slices: each synchronous fetch costs a full relay
        # round trip on top of the compute it waits for, so the CNN
        # for slice N+1..N+depth dispatches before slice N's
        # argmax/max is fetched and decoded, and the neighborhood
        # gather of slice N overlaps slice N+1's decode. Fetches run
        # on a small thread pool (device-to-host copies release the
        # GIL) so the round trips of consecutive slices overlap each
        # other too, and argmax/max travel as ONE packed payload
        # emitted by the forward program itself (one dispatch AND one
        # round trip per slice). depth bounds
        # the device-resident salience (each slice holds
        # [rows, bucket, 360] float32, ~24 MB)
        import collections as _collections
        import concurrent.futures
        import os as _os

        depth = 3
        fetch_pool = concurrent.futures.ThreadPoolExecutor(4)
        inflight = _collections.deque()  # (part, bucket, sal, stats_fut)
        gathers = _collections.deque()   # (part, bucket, mx, centers, neigh_fut)
        pending = []                     # (name, confidence, cents, nsamples)

        # the banded decoders are independent per row and the native
        # kernel is a ctypes foreign call (GIL released), so a slice's
        # rows decode across host cores; one core -> plain serial loop
        workers = min(8, _os.cpu_count() or 1)
        decode_pool = (
            concurrent.futures.ThreadPoolExecutor(workers)
            if self.viterbi and workers > 1 else None)

        def decode_slice():
            part, bucket, sal, stats_fut = inflight.popleft()
            stats = stats_fut.result()
            am = stats[..., 0].astype(np.int32)
            mx = np.ascontiguousarray(stats[..., 1])
            rows = am.shape[0]
            centers = np.zeros((rows, bucket), np.int32)

            def fill(task):
                i, nframes = task
                obs = am[i, :nframes]
                centers[i, :nframes] = (
                    _viterbi_bin_path(obs, 360) if self.viterbi
                    else obs)

            tasks = [
                (i, nframes)
                for i, (_, _, _, nframes) in enumerate(part)]
            if decode_pool is not None and len(tasks) > 1:
                list(decode_pool.map(fill, tasks))
            else:
                for task in tasks:
                    fill(task)
            neigh_dev = crepe.gather_neighborhood(
                sal.reshape(-1, sal.shape[-1]),
                jnp.asarray(centers.reshape(-1)))
            gathers.append((
                part, bucket, mx, centers,
                fetch_pool.submit(np.asarray, neigh_dev)))

        def assemble_slice():
            part, bucket, mx, centers, neigh_fut = gathers.popleft()
            rows = centers.shape[0]
            neigh = neigh_fut.result().reshape(rows, bucket, 9)
            for i, (name, nsamples, _, nframes) in enumerate(part):
                cents = _local_average_from_neighborhoods(
                    neigh[i, :nframes], centers[i, :nframes])
                pending.append(
                    (name, mx[i, :nframes], cents, nsamples))

        # decode='device': the whole decode (Viterbi + neighborhood
        # cents + confidence) is ONE jitted program over the slice's
        # device-resident salience — one dispatch, one [rows, T, 2]
        # fetch, no host decode on the critical path
        device_decode = self._decode_mode == 'device'
        if device_decode:
            (dec_log_start, _, dec_uniform, dec_self,
             dec_band) = _crepe_prior_logs(360)
            dec_mapping = crepe.cents_mapping()

        def assemble_device_slice():
            part, _, _, dec_fut = inflight.popleft()
            dec = dec_fut.result()  # [rows, bucket, 2]
            for i, (name, nsamples, _, nframes) in enumerate(part):
                pending.append((
                    name,
                    np.ascontiguousarray(dec[i, :nframes, 1]),
                    np.ascontiguousarray(dec[i, :nframes, 0]),
                    nsamples))

        # on a device mesh the slice row (utterance-segment) axis
        # shards over the 'data' axis: rows round up to a mesh
        # multiple (zero rows decode to discarded outputs), per-row
        # CNN outputs are mesh-invariant
        from shennong_tpu.parallel import mesh as meshing
        mesh = meshing.get_default_mesh()
        row_multiple = mesh.devices.size if mesh is not None else 1

        try:
            for bucket, items in sorted(groups.items()):
                seg_len, pad_left = crepe.segment_geometry(
                    hop, bucket, halo)
                # bound the frames per device program (the first conv
                # layer materializes ~128 KB per frame); pad the last
                # slice to the same row count so the program compiles
                # once. On the HOST-decode path small groups also
                # split into ~depth+1 slices so the CNN of later
                # slices overlaps the host Viterbi of earlier ones
                # (one big slice has nothing to pipeline against); the
                # device decode has no host stage to overlap, so it
                # takes the whole group per slice — every extra slice
                # only adds relay round trips (measured on chip: the
                # ~4-way split is fastest for host decode, the 1-way
                # for device). Row counts quantize to geometric
                # buckets to keep the compiled-shape set bounded
                split = 1 if device_decode else depth + 1
                rows = max(1, min(
                    16384 // bucket,
                    bucket_size(
                        -(-len(items) // split), minimum=4)
                    if len(items) > 1 else 1))
                rows = -(-rows // row_multiple) * row_multiple
                for lo in range(0, len(items), rows):
                    part = items[lo:lo + rows]
                    segments = np.zeros((rows, seg_len), np.float32)
                    owners = np.zeros(rows, np.int32)
                    for i, (_, _, data, nframes) in enumerate(part):
                        segments[i, pad_left:pad_left + len(data)] = \
                            data
                        owners[i] = nframes - 1 + halo
                    # PCM audio is integer-valued float32: upload at
                    # half the bytes, convert inside the jitted
                    # forward (bit-identical values)
                    from shennong_tpu.parallel.stream import \
                        as_int16_if_lossless
                    segments = as_int16_if_lossless(segments)
                    if mesh is not None:
                        dev_segments = jax.device_put(
                            segments, meshing.batch_sharding(mesh))
                        dev_owners = jax.device_put(
                            owners, meshing.batch_sharding(mesh))
                    else:
                        dev_segments = jnp.asarray(segments)
                        dev_owners = jnp.asarray(owners)
                    sal, packed = crepe.forward_audio_chunk(
                        params, dev_segments, dev_owners,
                        hop, bucket, halo)
                    if device_decode:
                        lengths = np.ones(rows, np.int32)
                        for i, (_, _, _, nframes) in enumerate(part):
                            lengths[i] = max(1, nframes)
                        dec = crepe.decode_salience_chunk(
                            sal, jnp.asarray(lengths), dec_log_start,
                            dec_band, dec_uniform, dec_self,
                            dec_mapping, viterbi=bool(self.viterbi))
                        inflight.append((
                            part, bucket, None,
                            fetch_pool.submit(np.asarray, dec)))
                    else:
                        inflight.append((
                            part, bucket, sal,
                            fetch_pool.submit(np.asarray, packed)))
                    if len(inflight) >= depth:
                        (assemble_device_slice if device_decode
                         else decode_slice)()
                    if len(gathers) >= depth:
                        assemble_slice()
            while inflight:
                (assemble_device_slice if device_decode
                 else decode_slice)()
            while gathers:
                assemble_slice()
        finally:
            if decode_pool is not None:
                decode_pool.shutdown()
            fetch_pool.shutdown()
        for name, feats in self._finish_decode_batch(pending):
            collection[name] = feats
        return collection

    def _finish_decode_batch(self, items):
        """Grid-resample many decoded tracks, grouped.

        ``items`` is a list of (name, confidence, cents, nsamples).
        The FFT grid resampling of :meth:`_finish_decode` is
        independent per utterance, so utterances sharing an
        (input frames, output frames) geometry resample as one
        vectorized call instead of one per utterance — identical
        outputs, no serial host tail after the corpus Viterbi
        (reference tail: ``shennong/processor/pitch_crepe.py:
        473-485``, one scipy call per utterance). Yields
        (name, Features).
        """
        hop = np.round(self.sample_rate * self.frame_shift).astype(int)
        groups = {}
        for name, confidence, cents, nsamples in items:
            out_frames = 1 + int(
                (nsamples - self.frame_length * self.sample_rate)
                / hop)
            if confidence is None or out_frames <= 0:
                yield name, Features(
                    np.zeros((0, 2)), self.times(0),
                    properties=self.get_properties())
                continue
            frequency = 10 * 2 ** (cents / 1200)
            frequency[np.isnan(frequency)] = 0
            groups.setdefault(
                (confidence.shape[0], out_frames), []).append(
                (name, confidence, frequency))

        for (_, out_frames), members in groups.items():
            stack = np.stack([
                np.stack([confidence, frequency], axis=1)
                for _, confidence, frequency in members])
            with warnings.catch_warnings():
                warnings.simplefilter('ignore')
                data = scipy.signal.resample(stack, out_frames, axis=1)
            data[..., 0] = np.where(
                data[..., 0] < 1e-2, 0, np.minimum(data[..., 0], 1))
            for row, (name, _, _) in enumerate(members):
                yield name, Features(
                    data[row], self.times(out_frames),
                    properties=self.get_properties())

    def process(self, audio):
        """Extract (confidence, pitch) using CREPE.

        The audio is transparently resampled to 16 kHz; the CNN output
        grid is resampled onto the processor's frame grid.
        """
        audio = self._check_audio(audio)
        return self._decode_salience(
            self._device_salience(audio.data), audio.shape[0])

    def _decode_salience(self, salience, nsamples):
        """Decode a :class:`_DeviceSalience` into (POV, pitch)."""
        if salience is None:
            return self._finish_decode(None, None, nsamples)
        if self.viterbi:
            centers = _viterbi_bin_path(salience.argmax, 360)
        else:
            centers = salience.argmax
        cents = _local_average_from_neighborhoods(
            salience.neighborhoods(centers), centers)
        return self._finish_decode(salience.amax, cents, nsamples)

    def _decode(self, activation, nsamples):
        """Decode one utterance's activations into (POV, pitch)."""
        if activation.shape[0] == 0:
            return self._finish_decode(None, None, nsamples)
        confidence = activation.max(axis=1)
        if self.viterbi:
            cents = _to_viterbi_cents(activation)
        else:
            cents = _to_local_average_cents(
                activation, np.argmax(activation, axis=1))
        return self._finish_decode(confidence, cents, nsamples)

    def _finish_decode(self, confidence, cents, nsamples):
        """(confidence, cents) -> (POV, pitch) on the output grid."""
        hop = np.round(self.sample_rate * self.frame_shift).astype(int)
        out_frames = 1 + int(
            (nsamples - self.frame_length * self.sample_rate) / hop)
        if confidence is None or out_frames <= 0:
            # audio shorter than one model window or one output frame
            return Features(
                np.zeros((0, 2)), self.times(0),
                properties=self.get_properties())

        frequency = 10 * 2 ** (cents / 1200)
        frequency[np.isnan(frequency)] = 0

        # resample onto the target frame grid
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            data = scipy.signal.resample(
                np.array([confidence, frequency]).T, out_frames)

        # clamp the interpolated confidences into [0, 1]
        data[data[:, 0] < 1e-2, 0] = 0
        data[data[:, 0] > 1, 0] = 1

        return Features(
            data, self.times(data.shape[0]),
            properties=self.get_properties())


class CrepePitchPostProcessor(KaldiPitchPostProcessor):
    """Processes the raw (POV, pitch) computed by the CrepePitchProcessor

    Turns the raw pitch quantities into usable features. Converts the POV into
    NCCF usable by the Kaldi-style post-processing, then removes the pitch at
    frames judged unvoiced (2-state HMM on the confidence) and replaces them
    with interpolated values, finally runs the standard pitch
    post-processing.

    """

    def __init__(self, pitch_scale=2.0, delta_pitch_scale=10.0,
                 delta_pitch_noise_stddev=0.005,
                 normalization_left_context=75,
                 normalization_right_context=75,
                 delta_window=2, delay=0,
                 add_pov_feature=True, add_normalized_log_pitch=True,
                 add_delta_pitch=True, add_raw_log_pitch=False):
        super().__init__(
            pitch_scale=pitch_scale,
            delta_pitch_scale=delta_pitch_scale,
            delta_pitch_noise_stddev=delta_pitch_noise_stddev,
            normalization_left_context=normalization_left_context,
            normalization_right_context=normalization_right_context,
            delta_window=delta_window,
            delay=delay,
            add_pov_feature=add_pov_feature,
            add_normalized_log_pitch=add_normalized_log_pitch,
            add_delta_pitch=add_delta_pitch,
            add_raw_log_pitch=add_raw_log_pitch)

    @property
    def name(self):
        return 'crepe postprocessing'

    def get_properties(self, features):
        properties = copy.deepcopy(features.properties)
        properties['crepe'][self.name] = self.get_params()
        properties['pipeline'][0]['columns'] = [0, self.ndims - 1]
        return properties

    def process(self, crepe_pitch):
        """Post-process raw (POV, pitch) from CREPE.

        Unvoiced frames get interpolated pitch values; the POV column
        is inverted into an NCCF before the Kaldi-style
        post-processing runs.
        """
        if not (self.add_pov_feature or self.add_normalized_log_pitch
                or self.add_delta_pitch or self.add_raw_log_pitch):
            raise ValueError(
                'at least one of the following options must be True: '
                'add_pov_feature, add_normalized_log_pitch, '
                'add_delta_pitch, add_raw_log_pitch')

        if crepe_pitch.shape[1] != 2:
            raise ValueError(
                'data shape must be (_, 2), but it is (_, {})'
                .format(crepe_pitch.shape[1]))

        # interpolate pitch through unvoiced gaps
        to_remove = predict_voicing(crepe_pitch.data[:, 0]) == 0
        if np.all(to_remove):
            raise ValueError('No voiced frames')

        data = crepe_pitch.data[:, 1].copy()
        keep = np.where(~to_remove)[0]
        first, last = keep[0], keep[-1]
        first_value, last_value = data[first], data[last]
        data[to_remove] = np.interp(
            np.where(to_remove)[0], keep, data[keep])
        data[:first] = first_value
        data[last:] = last_value

        if not np.all(data > 0):
            raise ValueError(
                'Not all pitch values are positive: issue with '
                'extracted pitch or interpolation')

        nccf = _pov_to_nccf(np.clip(crepe_pitch.data[:, 0], 0, 1))

        return super().process(
            Features(np.vstack((nccf, data)).T,
                     crepe_pitch.times,
                     crepe_pitch.properties))
