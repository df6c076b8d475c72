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

import numpy as np

import jax

from shennong_tpu import Features, FeaturesCollection
from shennong_tpu.ops import pitch as pitch_ops
from shennong_tpu.ops import plp as plp_ops
from shennong_tpu.ops import spectral
from shennong_tpu.ops.framing import num_frames
from shennong_tpu.parallel import mesh as meshing
from shennong_tpu.parallel import stream as streaming


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

    def process_all(self, utterances, vtln_warp=None, njobs=4):
        """Extract features for every utterance.

        ``vtln_warp`` optionally maps utterance names to warp factors
        (mel-based processors only). Returns a FeaturesCollection.
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

        for names, signals, nsamples, nvalid in streaming.stream_batches(
                utterances, self.batch_size, self._pad_multiple(),
                njobs=njobs):
            # one host fetch for the whole batch: per-row slicing
            # would pay one relay round trip per utterance
            feats = np.asarray(self._run_batch(
                names, signals, nsamples, vtln_warp))
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
        return collection

    def _check_sample_rates(self, utterances):
        """The whole batch must share the processor's sample rate."""
        from shennong_tpu.audio import Audio
        proc = self.processor
        for utt in utterances:
            rate = Audio.scan(utt.audio_file).sample_rate
            if float(proc.sample_rate) != float(rate):
                raise ValueError(
                    'processor and signal mismatch in sample rates: '
                    '{} != {}'.format(proc.sample_rate, rate))

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
            signals, nsamples_dev = self._device_put(signals, nsamples)
            frame_opts = proc.frame_options()
            nframes_max = num_frames(signals.shape[1], frame_opts)
            key = None
            if frame_opts.dither != 0:
                from shennong_tpu.processor.base import _fresh_key
                key = _fresh_key()
            feats = spectral.mfcc_multi_warp_batch(
                signals, nsamples_dev, mel_weights, proc.options(),
                nframes_max, key=key)
            feats = np.asarray(feats)
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
                               njobs=4):
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

        moments = []
        for names, signals, nsamples, nvalid in streaming.stream_batches(
                utterances, self.batch_size, self._pad_multiple(),
                njobs=njobs):
            frame_opts = proc.frame_options()
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
            moments.append(tuple(np.asarray(o) for o in out))
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
            import dataclasses
            frame = frame_opts
            if proc.raw_energy:
                frame = dataclasses.replace(
                    frame, preemph_coeff=0.0, window_type='rectangular')
            opts = spectral.EnergyOpts(
                frame=frame, raw_energy=proc.raw_energy,
                compression=proc.compression)
            return spectral.energy_batch(
                signals, nsamples_dev, opts, nframes_max,
                compression=proc.compression, key=key)

        if name == 'spectrogram':
            return spectral.spectrogram_batch(
                signals, nsamples_dev, proc.options(), nframes_max,
                key=key)

        # mel-based processors, with optional per-utterance warps
        if vtln_warp is None:
            mel_weights = proc.mel_weights(1.0)
        else:
            warps = [vtln_warp[utt] for utt in names]
            # padding rows reuse the last warp
            warps += [warps[-1]] * (signals.shape[0] - len(warps))
            if len(set(warps)) == 1:
                mel_weights = proc.mel_weights(warps[0])
            else:
                mel_weights = np.stack(
                    [proc.mel_weights(w) for w in warps])

        if name == 'plp':
            if vtln_warp is None:
                eql = proc.equal_loudness(1.0)
            else:
                eqls = [proc.equal_loudness(w) for w in warps]
                eql = (eqls[0] if len(set(warps)) == 1
                       else np.stack(eqls))
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
