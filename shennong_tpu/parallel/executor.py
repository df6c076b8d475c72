"""Batched multi-utterance feature extraction engine.

One :class:`BatchExecutor` drives a frame-based processor (MFCC,
filterbank, spectrogram, PLP, energy, Kaldi pitch) over a whole
utterance collection: utterances are planned into padded length
buckets from scanned metadata, decoded by the streaming host data
plane (:mod:`shennong_tpu.parallel.stream` — at most ``depth`` batches
in host RAM, decode overlapping device compute), and each bucket runs
as one jitted XLA program — on a multi-device mesh, sharded over the
utterance axis. This replaces the reference's joblib thread pools
(``shennong/processor/base.py:104``, ``shennong/pipeline.py:545-565``).
"""

import concurrent.futures

import numpy as np

import jax
import jax.numpy as jnp

from shennong_tpu import Features, FeaturesCollection
from shennong_tpu.ops import pitch as pitch_ops
from shennong_tpu.ops import plp as plp_ops
from shennong_tpu.ops import spectral
from shennong_tpu.ops.framing import num_frames
from shennong_tpu.parallel import mesh as meshing
from shennong_tpu.parallel import stream as streaming
from shennong_tpu.parallel.profiler import counters


class FusedPipelineExecutor:
    """Pipeline pass 1 as ONE fused device program per signal batch.

    Where :class:`BatchExecutor` sweeps the corpus once per stage
    (features, energy, VAD, pitch, pitch post — each sweep re-uploads
    the signals and pays its own per-batch round trips), this executor
    dispatches :func:`shennong_tpu.parallel.fused.pass_one_program`:
    one signal upload, one program, one fetch per batch, with up to
    ``depth`` batches in flight so host decode, uploads, device
    compute and result fetches overlap. Signals upload as int16
    (half the bytes) whenever the decoded audio is integer-valued.

    Parameters mirror the pipeline's pass-1 processors; ``energy_proc``
    + ``vad_proc`` enable the VAD output, ``pitch_proc`` +
    ``pitch_post`` the post-processed pitch output.
    """

    def __init__(self, feat_proc, warps=None, energy_proc=None,
                 vad_proc=None, pitch_proc=None, pitch_post=None,
                 batch_size=64, mesh=None, depth=2,
                 signal_cache=None, fetch_dtype='float32'):
        self.feat_proc = feat_proc
        self.warps = warps
        self.energy_proc = energy_proc
        self.vad_proc = vad_proc
        self.pitch_proc = pitch_proc
        self.pitch_post = pitch_post
        self.batch_size = int(batch_size)
        self.depth = max(1, int(depth))
        self.mesh = mesh if mesh is not None else \
            meshing.get_default_mesh()
        self.signal_cache = signal_cache
        self.fetch_dtype = _check_fetch_dtype(fetch_dtype)

    def _static_opts(self):
        """The per-run static configuration of the fused program."""
        proc = self.feat_proc
        opts = {'kind': proc.name, 'feat_opts': proc.options()}

        if self.energy_proc is not None:
            eproc = self.energy_proc
            opts['energy_opts'] = _energy_opts(eproc)
            opts['compression'] = eproc.compression
            vproc = self.vad_proc
            opts['vad_opts'] = (
                vproc.energy_threshold, vproc.energy_mean_scale,
                vproc.frames_context, vproc.proportion_threshold)

        if self.pitch_proc is not None:
            opts['pitch_opts'] = self.pitch_proc.options()
            opts['post_opts'] = self.pitch_post.options()
            opts['with_noise'] = bool(
                self.pitch_post.add_delta_pitch
                and self.pitch_post.delta_pitch_noise_stddev != 0)
        return opts

    def _mel_inputs(self, names, rows):
        """(mel_weights, equal_loudness) for one batch (warp-aware)."""
        proc = self.feat_proc
        if not hasattr(proc, 'mel_weights'):
            placeholder = np.zeros(1, dtype=np.float32)
            return placeholder, placeholder
        mel, eql = _mel_fanout(proc, names, rows, self.warps)
        if eql is None:
            eql = np.zeros(1, dtype=np.float32)
        return mel, eql

    def run(self, utterances, njobs=4, on_utterance=None):
        """Extract pass 1 for every utterance.

        Returns ``(features, vads, pitches)``: a FeaturesCollection,
        a dict of per-frame uint8 VAD decisions (or None), and a
        FeaturesCollection of post-processed pitch (or None).

        With ``on_utterance`` given, each drained utterance is handed
        to ``on_utterance(name, features, vad, pitch)`` as its batch
        lands (vad/pitch None when not configured) instead of being
        collected — the caller can start downstream host work while
        later batches are still in flight; the returned collections
        stay empty.
        """
        import collections

        from shennong_tpu.parallel.fused import pass_one_program

        utterances = list(utterances)
        _check_sample_rates(utterances, self.feat_proc)
        if self.pitch_post is not None:
            self.pitch_post._validate_flags()

        static = self._static_opts()
        frame_opts = self.feat_proc.frame_options()
        # every dithering stage of the fused program needs the key:
        # the energy-VAD stage keeps the EnergyProcessor default
        # dither even when the features' dither is 0 (the reference
        # and the stagewise/per-utterance paths dither it too)
        energy_opts = static.get('energy_opts')
        needs_key = (
            frame_opts.dither != 0
            or (energy_opts is not None
                and energy_opts.frame.dither != 0)
            or static.get('with_noise', False))

        sharding = None
        pad_multiple = 1
        if self.mesh is not None:
            sharding = meshing.batch_sharding(self.mesh)
            pad_multiple = self.mesh.devices.size

        features = FeaturesCollection()
        vads = {} if self.energy_proc is not None else None
        pitches = (
            FeaturesCollection() if self.pitch_proc is not None
            else None)

        from shennong_tpu.parallel.fused import pack_payload

        def dispatch(names, signals, nsamples):
            # integer-valued audio uploads as int16: half the bytes
            # through the host-device link (cache-replayed batches are
            # device arrays, converted once at population time)
            upload = streaming.as_int16_if_lossless(signals)
            with counters.timed('dispatch_s'):
                if isinstance(upload, np.ndarray):  # not cache-replayed
                    counters.add(
                        'bytes_up', upload.nbytes + nsamples.nbytes)
                if sharding is not None:
                    dev_signals = jax.device_put(upload, sharding)
                    dev_nsamples = jax.device_put(nsamples, sharding)
                else:
                    dev_signals = jax.device_put(upload)
                    dev_nsamples = jax.device_put(nsamples)
                mel, eql = self._mel_inputs(names, signals.shape[0])
                kwargs = dict(static)
                kwargs['nframes_max'] = num_frames(
                    signals.shape[1], frame_opts)
                if self.pitch_proc is not None:
                    kwargs['pitch_frames_max'] = \
                        pitch_ops.num_pitch_frames(
                            signals.shape[1], kwargs['pitch_opts'])
                if needs_key:
                    from shennong_tpu.processor.base import _fresh_key
                    kwargs['key'] = _fresh_key()
                out = pass_one_program(
                    dev_signals, dev_nsamples, mel, eql, **kwargs)
                # every output packs into ONE uint8 payload on device:
                # a single host fetch per batch instead of one relay
                # round trip per output array
                layout = _payload_layout(out, self.fetch_dtype)
                payload = pack_payload(
                    tuple(out[name] for name, _, _ in layout),
                    dtype=self.fetch_dtype)
                counters.add('dispatches', 2)
                # fetch on the pool: device-to-host copies release the
                # GIL, so in-flight batches' round trips overlap each
                # other (and the next batches' uploads) instead of
                # serializing on one transfer stream
                fut = fetch_pool.submit(np.asarray, payload)
            return names, nsamples, layout, fut, signals

        def drain(names, nsamples, layout, fut, signals):
            with counters.timed('fetch_s'):
                out = _unpack_payload(fut.result(), layout)
            feats = out['feats']
            vad = out.get('vad')
            pitch = out.get('pitch')
            counters.add('bytes_down', sum(
                int(np.prod(shape)) * dtype.itemsize
                for _, shape, dtype in layout))
            # per-utterance COPIES, not views: a view would pin the
            # whole padded batch payload until the last utterance of
            # the batch is released, so at corpus scale every payload
            # stays alive through pass 1 (~1 GB per 7 h measured).
            # Copying the realized rows (~170 MB per 7 h) frees each
            # payload as soon as its batch is drained.
            for row, name in enumerate(names):
                nframes = self.feat_proc.output_frames(
                    int(nsamples[row]))
                properties = (
                    self.feat_proc.get_properties(
                        vtln_warp=self.warps[name])
                    if self.warps is not None and hasattr(
                        self.feat_proc, 'mel_weights')
                    else self.feat_proc.get_properties())
                utt_features = Features(
                    np.ascontiguousarray(feats[row, :nframes]),
                    self.feat_proc.times(nframes),
                    properties=properties)
                utt_vad = (
                    np.ascontiguousarray(vad[row, :nframes])
                    if vad is not None else None)
                utt_pitch = None
                if pitch is not None:
                    pframes = self.pitch_proc.output_frames(
                        int(nsamples[row]))
                    raw_props = _RawProps(
                        self.pitch_proc.get_properties())
                    utt_pitch = Features(
                        np.ascontiguousarray(pitch[row, :pframes]),
                        self.pitch_proc.times(pframes),
                        properties=self.pitch_post.get_properties(
                            raw_props))
                if on_utterance is not None:
                    on_utterance(name, utt_features, utt_vad, utt_pitch)
                    continue
                features[name] = utt_features
                if utt_vad is not None:
                    vads[name] = utt_vad
                if utt_pitch is not None:
                    pitches[name] = utt_pitch
            # the program's outputs arrived, so its input upload is
            # long done: the batch buffer is safe to reuse
            streaming.recycle(signals)

        source = streaming.stream_source(
            self.signal_cache, utterances, self.batch_size,
            pad_multiple, njobs=njobs, depth=self.depth)
        inflight = collections.deque()
        with concurrent.futures.ThreadPoolExecutor(
                max(2, self.depth + 1)) as fetch_pool:
            for names, signals, nsamples, nvalid in source:
                inflight.append(dispatch(names, signals, nsamples))
                if len(inflight) > self.depth:
                    drain(*inflight.popleft())
            while inflight:
                drain(*inflight.popleft())
        return features, vads, pitches


class _RawProps:
    """Duck-typed stand-in for the raw pitch Features (the fused path
    never materializes them; only ``properties`` is chained)."""

    def __init__(self, properties):
        self.properties = properties


def _check_sample_rates(utterances, proc):
    """The whole batch must share the processor's sample rate."""
    from shennong_tpu.audio import Audio
    for utt in utterances:
        rate = Audio.scan(utt.audio_file).sample_rate
        if float(proc.sample_rate) != float(rate):
            raise ValueError(
                'processor and signal mismatch in sample rates: '
                '{} != {}'.format(proc.sample_rate, rate))


#: fetch dtypes accepted by the packed-payload path ('float16' /
#: 'bfloat16' halve the fetched bytes; opt-in, not bit-exact)
_FETCH_DTYPES = ('float32', 'float16', 'bfloat16')


def _check_fetch_dtype(fetch_dtype):
    """Canonical numpy dtype for a fetch precision name."""
    name = str(np.dtype(fetch_dtype)) if fetch_dtype != 'bfloat16' \
        else 'bfloat16'
    if name not in _FETCH_DTYPES:
        raise ValueError(
            'fetch_dtype must be one of {}, got {}'.format(
                ', '.join(_FETCH_DTYPES), fetch_dtype))
    if name == 'bfloat16':
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def _payload_layout(out, fetch_dtype):
    """(name, shape, host dtype) triplets in payload pack order.

    Must mirror the iteration order of
    :func:`shennong_tpu.parallel.fused.pack_payload`: float arrays
    carry ``fetch_dtype``, uint8 arrays (VAD) pass through.
    """
    layout = [('feats', out['feats'].shape, fetch_dtype)]
    if 'vad' in out:
        layout.append(('vad', out['vad'].shape, np.dtype(np.uint8)))
    if 'pitch' in out:
        layout.append(('pitch', out['pitch'].shape, fetch_dtype))
    return layout


def _unpack_payload(payload, layout):
    """Split one fetched uint8 payload into named arrays (zero-copy
    views; reduced-precision floats upcast to float32)."""
    out, cursor = {}, 0
    for name, shape, dtype in layout:
        nbytes = int(np.prod(shape)) * dtype.itemsize
        part = payload[cursor:cursor + nbytes].view(dtype).reshape(shape)
        cursor += nbytes
        if dtype.itemsize != 1 and dtype != np.float32:
            part = part.astype(np.float32)
        out[name] = part
    return out


def _energy_opts(proc):
    """EnergyOpts for an EnergyProcessor (raw-energy framing rules)."""
    import dataclasses
    frame = proc.frame_options()
    if proc.raw_energy:
        frame = dataclasses.replace(
            frame, preemph_coeff=0.0, window_type='rectangular')
    return spectral.EnergyOpts(
        frame=frame, raw_energy=proc.raw_energy,
        compression=proc.compression)


def _mel_fanout(proc, names, rows, warps):
    """(mel_weights, equal_loudness-or-None) with per-row VTLN warps.

    ``warps`` is a name->warp dict or None (no warping). Padding rows
    reuse the last utterance's warp; a batch sharing one warp value
    collapses to a single unbatched matrix.
    """
    want_eql = proc.name == 'plp'
    if warps is None:
        return (proc.mel_weights(1.0),
                proc.equal_loudness(1.0) if want_eql else None)
    per_row = [warps[name] for name in names]
    per_row += [per_row[-1]] * (rows - len(per_row))
    if len(set(per_row)) == 1:
        return (proc.mel_weights(per_row[0]),
                proc.equal_loudness(per_row[0]) if want_eql else None)
    mel = np.stack([proc.mel_weights(w) for w in per_row])
    eql = (np.stack([proc.equal_loudness(w) for w in per_row])
           if want_eql else None)
    return mel, eql


class BatchExecutor:
    """Runs a processor over utterance collections in padded batches.

    Parameters
    ----------
    processor :
        A frame-based processor (MfccProcessor, FilterbankProcessor,
        SpectrogramProcessor, PlpProcessor, EnergyProcessor or
        KaldiPitchProcessor).
    batch_size : int, optional
        Utterances per device batch, default 16.
    mesh : jax.sharding.Mesh, optional
        When given, batches are sharded over the mesh's 'data' axis
        (one shard of utterances per device).
    """

    def __init__(self, processor, batch_size=16, mesh=None):
        self.processor = processor
        self.batch_size = int(batch_size)
        self.mesh = mesh if mesh is not None else \
            meshing.get_default_mesh()

    def _sharding(self):
        if self.mesh is None:
            return None
        return meshing.batch_sharding(self.mesh)

    def _pad_multiple(self):
        if self.mesh is None:
            return 1
        return self.mesh.devices.size

    def _device_put(self, signals, nsamples):
        sharding = self._sharding()
        if sharding is None:
            return signals, nsamples
        return (jax.device_put(signals, sharding),
                jax.device_put(nsamples, sharding))

    def process_all(self, utterances, vtln_warp=None, njobs=4,
                    signal_cache=None):
        """Extract features for every utterance.

        ``vtln_warp`` optionally maps utterance names to warp factors
        (mel-based processors only). ``signal_cache`` optionally
        replays already-uploaded device signal batches
        (:class:`shennong_tpu.parallel.stream.SignalCache`). Returns a
        FeaturesCollection.
        """
        proc = self.processor
        name = proc.name

        if vtln_warp is not None and not hasattr(proc, 'mel_weights'):
            raise ValueError(
                f'processor {name} does not accept VTLN warps')

        # materialize first (a generator would be exhausted by the
        # rate check below and silently yield zero utterances)
        utterances = list(utterances)
        self._check_sample_rates(utterances)

        collection = FeaturesCollection()

        # hour-scale utterances would force one giant padded bucket;
        # route them through chunked single-utterance extraction and
        # batch only the rest (see FramesProcessor.process_chunked)
        limit = getattr(proc, 'AUTO_CHUNK_FRAMES', None)
        if limit and hasattr(proc, 'process_chunked'):
            regular = []
            for utt in utterances:
                frames = proc.output_frames(
                    int(utt.duration * float(proc.sample_rate)))
                if frames > limit:
                    kwargs = (
                        {'vtln_warp': vtln_warp[utt.name]}
                        if vtln_warp is not None else {})
                    collection[utt.name] = proc.process_chunked(
                        utt.load_audio(), **kwargs)
                else:
                    regular.append(utt)
            utterances = regular
        if not utterances:
            return collection

        source = streaming.stream_source(
            signal_cache, utterances, self.batch_size,
            self._pad_multiple(), njobs=njobs)
        for names, signals, nsamples, nvalid in source:
            with counters.timed('dispatch_s'):
                if isinstance(signals, np.ndarray):
                    counters.add(
                        'bytes_up', signals.nbytes + nsamples.nbytes)
                counters.add('dispatches')
                out = self._run_batch(
                    names, signals, nsamples, vtln_warp)
            # one host fetch for the whole batch: per-row slicing
            # would pay one relay round trip per utterance
            with counters.timed('fetch_s'):
                feats = np.asarray(out)
            counters.add('bytes_down', feats.nbytes)
            for row, utt_name in enumerate(names):
                nframes = proc.output_frames(int(nsamples[row]))
                data = feats[row, :nframes]
                if name == 'energy':
                    data = data.astype(np.float64)[:, None]
                properties = (
                    proc.get_properties(
                        vtln_warp=vtln_warp[utt_name])
                    if vtln_warp is not None and hasattr(
                        proc, 'mel_weights')
                    else proc.get_properties())
                collection[utt_name] = Features(
                    data, proc.times(data.shape[0]),
                    properties=properties)
            streaming.recycle(signals)
        return collection

    def _check_sample_rates(self, utterances):
        """The whole batch must share the processor's sample rate."""
        _check_sample_rates(utterances, self.processor)

    def process_all_classes(self, utterances, class_warps, njobs=4):
        """Extract MFCCs for every VTLN warp class in one pass.

        The framing and the DFT run once per batch; only the mel bank
        fans out over the ``class_warps`` list (LVTLN base-transform
        training). Returns one FeaturesCollection per class.
        """
        proc = self.processor
        if proc.name != 'mfcc':
            raise ValueError(
                'multi-class warping requires an MFCC processor, '
                f'got {proc.name}')

        utterances = list(utterances)
        self._check_sample_rates(utterances)

        collections = [
            FeaturesCollection() for _ in class_warps]

        # hour-scale utterances: chunked per-class extraction instead
        # of a giant padded bucket fanned out over every warp class
        limit = proc.AUTO_CHUNK_FRAMES
        if limit:
            regular = []
            for utt in utterances:
                frames = proc.output_frames(
                    int(utt.duration * float(proc.sample_rate)))
                if frames > limit:
                    audio = utt.load_audio()
                    for c, warp in enumerate(class_warps):
                        collections[c][utt.name] = proc.process_chunked(
                            audio, vtln_warp=warp)
                else:
                    regular.append(utt)
            utterances = regular
        if not utterances:
            return collections

        mel_weights = np.stack(
            [proc.mel_weights(w) for w in class_warps])
        for names, signals, nsamples, nvalid in streaming.stream_batches(
                utterances, self.batch_size, self._pad_multiple(),
                njobs=njobs):
            dev_signals, nsamples_dev = self._device_put(
                signals, nsamples)
            frame_opts = proc.frame_options()
            nframes_max = num_frames(signals.shape[1], frame_opts)
            key = None
            if frame_opts.dither != 0:
                from shennong_tpu.processor.base import _fresh_key
                key = _fresh_key()
            feats = spectral.mfcc_multi_warp_batch(
                dev_signals, nsamples_dev, mel_weights, proc.options(),
                nframes_max, key=key)
            feats = np.asarray(feats)
            streaming.recycle(signals)
            for row, utt_name in enumerate(names):
                nframes = num_frames(
                    int(nsamples[row]), frame_opts)
                for c, warp in enumerate(class_warps):
                    collections[c][utt_name] = Features(
                        feats[c, row, :nframes],
                        proc.times(nframes),
                        properties=proc.get_properties(vtln_warp=warp))
        return collections

    def accumulate_lvtln_stats(self, utterances, class_warps, keep,
                               delta_order=None, delta_window=None,
                               njobs=4, signal_cache=None):
        """LS mapping statistics for every VTLN warp class, fused.

        ``keep`` maps utterance names to per-frame float weights (the
        VAD-and-subsample selection). The per-class features are never
        materialized on the host: each signal batch runs one device
        program producing centered weighted moments
        (:func:`shennong_tpu.ops.fmllr.warp_class_mapping_moments`).

        Returns the list of per-batch moment tuples for
        :func:`shennong_tpu.ops.fmllr.solve_mapping_from_moments`.
        """
        import jax.numpy as jnp

        from shennong_tpu.ops import fmllr as fmllr_ops

        proc = self.processor
        if proc.name != 'mfcc':
            raise ValueError(
                'LVTLN statistics require an MFCC processor, '
                f'got {proc.name}')

        utterances = list(utterances)
        self._check_sample_rates(utterances)

        mel_weights = np.stack(
            [proc.mel_weights(w) for w in class_warps]
            + [proc.mel_weights(1.0)])

        # the fused moment program materializes the (C+1)-way warped
        # feature fan-out [C+1, rows, T, D(+deltas)] about twice over:
        # size the batch rows to a ~2 GB footprint so long utterances
        # shrink the batch instead of blowing device memory, and short
        # ones amortize the per-batch relay round trips
        frame_opts = proc.frame_options()
        max_frames = max(
            proc.output_frames(
                int(utt.duration * float(proc.sample_rate)))
            for utt in utterances)
        dim = proc.ndims * (
            delta_order + 1 if delta_order is not None else 1)
        bytes_per_row = (
            (len(class_warps) + 1) * max_frames * dim * 4 * 2)
        budget_rows = max(1, int((2 << 30) // max(bytes_per_row, 1)))
        batch_rows = min(64, budget_rows)

        source = streaming.stream_source(
            signal_cache, utterances, batch_rows,
            self._pad_multiple(), njobs=njobs)
        moments = []
        for names, signals, nsamples, nvalid in source:
            nframes_max = num_frames(signals.shape[1], frame_opts)
            nframes = np.ones(signals.shape[0], dtype=np.int32)
            weights = np.zeros(
                (signals.shape[0], nframes_max), dtype=np.float32)
            for row, name in enumerate(names):
                count = num_frames(int(nsamples[row]), frame_opts)
                nframes[row] = count
                weights[row, :count] = keep[name][:count]
            key = None
            if frame_opts.dither != 0:
                from shennong_tpu.processor.base import _fresh_key
                key = _fresh_key()
            out = fmllr_ops.warp_class_mapping_moments(
                signals, jnp.asarray(nsamples), jnp.asarray(nframes),
                jnp.asarray(mel_weights), jnp.asarray(weights),
                proc.options(), nframes_max,
                delta_order=delta_order, delta_window=delta_window,
                key=key)
            # ONE host fetch per batch: per-array fetches each pay a
            # full relay round trip (~50 ms), and the moment tuple
            # has five of them
            shapes = [o.shape for o in out]
            packed = np.asarray(jnp.concatenate(
                [o.reshape(-1) for o in out]))
            parts, cursor = [], 0
            for shape in shapes:
                size = int(np.prod(shape)) if shape else 1
                parts.append(
                    packed[cursor:cursor + size].reshape(shape))
                cursor += size
            moments.append(tuple(parts))
            streaming.recycle(signals)
        return moments

    def _run_batch(self, names, signals, nsamples, vtln_warp):
        proc = self.processor
        name = proc.name
        signals, nsamples_dev = self._device_put(signals, nsamples)

        if name == 'pitch':
            opts = proc.options()
            nframes_max = pitch_ops.num_pitch_frames(
                signals.shape[1], opts)
            return pitch_ops.compute_pitch(
                signals, nsamples_dev, opts, nframes_max)

        frame_opts = proc.frame_options()
        nframes_max = num_frames(signals.shape[1], frame_opts)
        key = None
        if frame_opts.dither != 0:
            from shennong_tpu.processor.base import _fresh_key
            key = _fresh_key()

        if name == 'energy':
            return spectral.energy_batch(
                signals, nsamples_dev, _energy_opts(proc),
                nframes_max, compression=proc.compression, key=key)

        if name == 'spectrogram':
            return spectral.spectrogram_batch(
                signals, nsamples_dev, proc.options(), nframes_max,
                key=key)

        # mel-based processors, with optional per-utterance warps
        mel_weights, eql = _mel_fanout(
            proc, names, signals.shape[0], vtln_warp)

        if name == 'plp':
            return plp_ops.plp_batch(
                signals, nsamples_dev, mel_weights, eql,
                proc.options(), nframes_max, key=key)

        if name == 'mfcc':
            return spectral.mfcc_batch(
                signals, nsamples_dev, mel_weights, proc.options(),
                nframes_max, key=key)

        if name == 'filterbank':
            return spectral.fbank_batch(
                signals, nsamples_dev, mel_weights, proc.options(),
                nframes_max, key=key)

        raise ValueError(
            f'processor {name} does not support batched execution')
