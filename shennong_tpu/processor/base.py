"""Base classes for the feature processors.

API-compatible with ``shennong/processor/base.py`` of the reference
(FeaturesProcessor / FramesProcessor / MelFeaturesProcessor), but the
execution model is TPU-native: every concrete processor lowers to a
batched jitted XLA computation over padded signals. ``process``
handles one utterance (a batch of one, padded to a length bucket so
jit caches stay small); ``process_all`` runs whole utterance
collections.
"""

import abc
import copy
import threading

import numpy as np

import jax

from shennong_tpu import Features, FeaturesCollection
from shennong_tpu.audio import Audio
from shennong_tpu.base import BaseProcessor
from shennong_tpu.ops.framing import (
    FrameOptions, WINDOW_TYPES, bucket_size, num_frames)
from shennong_tpu.ops.spectral import MelOpts
from shennong_tpu.utils import get_njobs

_DITHER_SEED = np.random.SeedSequence(entropy=20260816)
_DITHER_LOCK = threading.Lock()


def _fresh_key():
    """A fresh PRNG key for dithering (non-reproducible by default,
    mirroring the reference's use of the C library PRNG).

    Locked: ``process()`` runs on threads under ``process_all`` /
    joblib, and an unlocked read-modify-write of the module seed
    chain could hand two utterances the identical dither key.
    """
    global _DITHER_SEED
    with _DITHER_LOCK:
        _DITHER_SEED = _DITHER_SEED.spawn(1)[0]
        seed = int(_DITHER_SEED.generate_state(1)[0])
    return jax.random.PRNGKey(seed)


class FeaturesProcessor(BaseProcessor, metaclass=abc.ABCMeta):
    """Base class of all the features extraction processors."""

    @property
    @abc.abstractmethod
    def name(self):  # pragma: nocover
        """Name of the processor"""

    @property
    @abc.abstractmethod
    def ndims(self):  # pragma: nocover
        """Dimension of the output features frames"""

    def get_properties(self, **kwargs):
        """Processor parameters and pipeline metadata as a dict"""
        params = self.get_params()
        params.update(kwargs)
        return {
            'pipeline': [
                {'name': self.name, 'columns': [0, self.ndims - 1]}],
            self.name: params}

    @abc.abstractmethod
    def process(self, signal):
        """Compute features from an input signal.

        Parameters
        ----------
        signal : :class:`~shennong_tpu.audio.Audio`
            The audio to process.

        Returns
        -------
        features : :class:`~shennong_tpu.features.Features`
        """

    def process_all(self, utterances, njobs=None, **kwargs):
        """Compute features for a whole utterance collection.

        ``kwargs`` values must be dicts indexed by utterance name and
        are forwarded per-utterance to :func:`process`. ``njobs``
        bounds host-side IO concurrency (device execution is batched
        and does not depend on it).

        Returns a :class:`FeaturesCollection` keyed like ``utterances``.
        """
        njobs = get_njobs(njobs, log=self.log)

        for name, value in kwargs.items():
            if not isinstance(value, dict):
                raise ValueError(f'argument "{name}" is not a dict')
            if value.keys() != utterances.by_name().keys():
                raise ValueError(
                    f'utterances and "{name}" have different names')

        collection = FeaturesCollection()
        for utt in utterances:
            collection[utt.name] = self.process(
                utt.load_audio(),
                **{k: v[utt.name] for k, v in kwargs.items()})
        return collection


class FramesProcessor(FeaturesProcessor, metaclass=abc.ABCMeta):
    """Base class for frame-based processors (Kaldi framing options)."""

    # frame count above which :func:`process` transparently switches
    # to chunked extraction; None disables the automatic routing
    AUTO_CHUNK_FRAMES = 60000

    def __init__(self, sample_rate=16000, frame_shift=0.01,
                 frame_length=0.025, dither=1.0, preemph_coeff=0.97,
                 remove_dc_offset=True, window_type='povey',
                 round_to_power_of_two=True, blackman_coeff=0.42,
                 snip_edges=True):
        super().__init__()
        self.sample_rate = sample_rate
        self.frame_shift = frame_shift
        self.frame_length = frame_length
        self.dither = dither
        self.preemph_coeff = preemph_coeff
        self.remove_dc_offset = remove_dc_offset
        self.window_type = window_type
        self.round_to_power_of_two = round_to_power_of_two
        self.blackman_coeff = blackman_coeff
        self.snip_edges = snip_edges

    @property
    def sample_rate(self):
        """Expected sampling rate of the input waveform (Hz).

        Signals handed to process must be sampled at this rate.

        """
        return np.float32(self._sample_rate)

    @sample_rate.setter
    def sample_rate(self, value):
        self._sample_rate = float(value)

    @property
    def frame_shift(self):
        """Time step between two consecutive frames, in seconds"""
        return np.float32(self._frame_shift)

    @frame_shift.setter
    def frame_shift(self, value):
        self._frame_shift = float(value)

    @property
    def frame_length(self):
        """Duration of the analysis window, in seconds"""
        return np.float32(self._frame_length)

    @frame_length.setter
    def frame_length(self, value):
        self._frame_length = float(value)

    @property
    def dither(self):
        """Dithering noise amplitude (0 disables dithering)"""
        return np.float32(self._dither)

    @dither.setter
    def dither(self, value):
        self._dither = float(value)

    @property
    def preemph_coeff(self):
        """Pre-emphasis filter coefficient (0 disables it)"""
        return np.float32(self._preemph_coeff)

    @preemph_coeff.setter
    def preemph_coeff(self, value):
        self._preemph_coeff = float(value)

    @property
    def remove_dc_offset(self):
        """Whether each frame gets its mean (DC offset) removed"""
        return self._remove_dc_offset

    @remove_dc_offset.setter
    def remove_dc_offset(self, value):
        self._remove_dc_offset = bool(value)

    @property
    def window_type(self):
        """Analysis window shape

        One of 'hamming', 'hanning', 'povey', 'rectangular' or
        'blackman'.

        """
        return self._window_type

    @window_type.setter
    def window_type(self, value):
        if value not in WINDOW_TYPES:
            raise ValueError(
                'window type must be in {}, it is {}'.format(
                    list(WINDOW_TYPES), value))
        self._window_type = value

    @property
    def round_to_power_of_two(self):
        """Whether frames are zero-padded to a power-of-two FFT size"""
        return self._round_to_power_of_two

    @round_to_power_of_two.setter
    def round_to_power_of_two(self, value):
        self._round_to_power_of_two = bool(value)

    @property
    def blackman_coeff(self):
        """Shape constant of the generalized Blackman window

        Only relevant when window_type is 'blackman'.

        """
        return np.float32(self._blackman_coeff)

    @blackman_coeff.setter
    def blackman_coeff(self, value):
        self._blackman_coeff = float(value)

    @property
    def snip_edges(self):
        """Whether to emit only frames fully contained in the signal

        With snipping, the frame count depends on the frame_length;
        without, it depends on the frame_shift alone and edge frames
        read boundary-reflected samples.

        """
        return self._snip_edges

    @snip_edges.setter
    def snip_edges(self, value):
        self._snip_edges = bool(value)

    def process_all(self, utterances, njobs=None, **kwargs):
        """Batched extraction over a whole utterance collection.

        Overrides the generic per-utterance loop: utterances are
        sorted into padded length buckets and each bucket runs as one
        jitted XLA program (see
        :class:`shennong_tpu.parallel.executor.BatchExecutor`).
        ``kwargs`` may contain a ``vtln_warp`` dict (mel-based
        processors); other per-utterance arguments fall back to the
        sequential path.
        """
        njobs = get_njobs(njobs, log=self.log)
        for name, value in kwargs.items():
            if not isinstance(value, dict):
                raise ValueError(f'argument "{name}" is not a dict')
            if value.keys() != utterances.by_name().keys():
                raise ValueError(
                    f'utterances and "{name}" have different names')

        if set(kwargs) <= {'vtln_warp'} and hasattr(self, 'options'):
            from shennong_tpu.parallel.executor import BatchExecutor
            return BatchExecutor(self).process_all(
                utterances, vtln_warp=kwargs.get('vtln_warp'),
                njobs=njobs)
        return super().process_all(utterances, njobs=njobs, **kwargs)

    def process_chunked(self, signal, chunk_frames=20000,
                        halo_frames=256, **kwargs):
        """Extract features from a long signal in frame-aligned chunks.

        Bounds device memory for hour-scale utterances: the signal is
        split into pieces of ``chunk_frames`` frames, each processed
        through the regular jitted path, and the outputs concatenated.
        All chunks share one compiled program (identical shapes except
        the last, which lands in a length bucket).

        Frame-local computers (spectrogram, filterbank, MFCC, energy,
        plain PLP) produce bit-identical output to :func:`process`
        when ``dither`` is 0. Two documented deviations: dithering
        noise uses independent draws per chunk, and RASTA-PLP (the one
        stateful computer) re-enters each chunk through a left halo of
        ``halo_frames`` dropped frames — the RASTA IIR pole (0.94)
        decays the halo boundary error below 1e-6 within 256 frames.

        Frame placement matches Kaldi for both ``snip_edges`` settings
        (reference shennong/frames.py:213-233 mirrors edges; here the
        signal is symmetric-padded once on the host so every chunk is
        a plain strided slice).
        """
        chunk_frames = int(chunk_frames)
        if chunk_frames < 1:
            raise ValueError(
                f'chunk_frames must be >= 1, it is {chunk_frames}')
        if int(halo_frames) < 0:
            raise ValueError(
                f'halo_frames must be >= 0, it is {halo_frames}')

        self._check_signal(signal)
        opts = self.frame_options()
        total = num_frames(signal.nsamples, opts)
        if total <= chunk_frames:
            # run the regular path with automatic routing disabled,
            # so a small AUTO_CHUNK_FRAMES cannot re-enter here
            direct = copy.copy(self)
            direct.AUTO_CHUNK_FRAMES = None
            return direct.process(signal, **kwargs)

        data = signal.astype(np.int16).data
        shift, length = opts.window_shift, opts.window_size
        if opts.snip_edges:
            padded, offset = data, 0
        else:
            # one symmetric reflection (-1 -> 0, n -> n-1, ...) covers
            # the half-window overhang of the edge frames
            padded = np.pad(data, length, mode='symmetric')
            offset = length + shift // 2 - length // 2

        worker = copy.copy(self)
        worker.snip_edges = True
        worker.AUTO_CHUNK_FRAMES = None
        halo = int(halo_frames) if getattr(self, 'rasta', False) else 0

        pieces = []
        start = 0
        while start < total:
            stop = min(start + chunk_frames, total)
            head = max(start - halo, 0)
            lo = offset + head * shift
            hi = offset + (stop - 1) * shift + length
            piece = worker.process(
                Audio(padded[lo:hi], signal.sample_rate,
                      validate=False),
                **kwargs).data
            pieces.append(piece[start - head:])
            start = stop

        props_kwargs = dict(kwargs)
        if isinstance(self, MelFeaturesProcessor):
            props_kwargs.setdefault('vtln_warp', 1.0)
        return Features(
            np.concatenate(pieces, axis=0), self.times(total),
            properties=self.get_properties(**props_kwargs))

    def _maybe_chunk(self, signal, **kwargs):
        """Route very long signals to chunked extraction.

        Returns the chunked Features, or None when the signal is short
        enough for the regular single-program path.
        """
        limit = self.AUTO_CHUNK_FRAMES
        if limit and num_frames(
                signal.nsamples, self.frame_options()) > limit:
            return self.process_chunked(signal, **kwargs)
        return None

    def times(self, nframes):
        """(tstart, tstop) label for each output frame"""
        return np.vstack((
            np.arange(nframes) * self.frame_shift,
            np.arange(nframes) * self.frame_shift + self.frame_length)).T

    def output_frames(self, nsamples):
        """Output rows produced for a signal of ``nsamples`` samples
        (the batch executor sizes padded batches and the oversize
        route with this)."""
        return num_frames(nsamples, self.frame_options())

    def frame_options(self):
        """The current framing parameters as a static FrameOptions"""
        # snap the ms values to float32 like Kaldi's option structs:
        # a float32 seconds value times 1000 lands back on the exact
        # millisecond count (e.g. float32(0.01) * 1000 -> 10.0f)
        return FrameOptions(
            sample_rate=self._sample_rate,
            frame_shift_ms=float(np.float32(self._frame_shift * 1000.0)),
            frame_length_ms=float(np.float32(self._frame_length * 1000.0)),
            dither=self._dither,
            preemph_coeff=self._preemph_coeff,
            remove_dc_offset=self._remove_dc_offset,
            window_type=self._window_type,
            round_to_power_of_two=self._round_to_power_of_two,
            blackman_coeff=self._blackman_coeff,
            snip_edges=self._snip_edges)

    def _check_signal(self, signal):
        """Validate channel count and sample rate of an input signal."""
        if signal.nchannels != 1:
            raise ValueError(
                'signal must have one dimension, but it has {}'
                .format(signal.nchannels))
        if self.sample_rate != signal.sample_rate:
            raise ValueError(
                'processor and signal mismatch in sample rates: '
                '{} != {}'.format(self.sample_rate, signal.sample_rate))

    def _signal_batch(self, signal):
        """Prepare a batch-of-one padded signal for the jitted ops.

        Returns (signals [1, T_bucket] float32 in int16 range,
        nsamples [1] int32, nframes int, nframes_max int, key).
        """
        data = signal.astype(np.int16).data.astype(np.float32)
        opts = self.frame_options()
        nsamp = data.shape[0]
        bucket = bucket_size(nsamp)
        padded = np.zeros((1, bucket), dtype=np.float32)
        padded[0, :nsamp] = data

        nframes = num_frames(nsamp, opts)
        nframes_max = num_frames(bucket, opts)
        key = _fresh_key() if self._dither != 0 else None
        return padded, np.array([nsamp], dtype=np.int32), \
            nframes, nframes_max, key


class MelFeaturesProcessor(FramesProcessor, metaclass=abc.ABCMeta):
    """Base class for mel-based processors (MFCC, PLP, filterbank)."""

    def __init__(self, sample_rate=16000, frame_shift=0.01,
                 frame_length=0.025, dither=1.0, preemph_coeff=0.97,
                 remove_dc_offset=True, window_type='povey',
                 round_to_power_of_two=True, blackman_coeff=0.42,
                 snip_edges=True, num_bins=23, low_freq=20,
                 high_freq=0, vtln_low=100, vtln_high=-500):
        super().__init__(
            sample_rate=sample_rate, frame_shift=frame_shift,
            frame_length=frame_length, dither=dither,
            preemph_coeff=preemph_coeff,
            remove_dc_offset=remove_dc_offset, window_type=window_type,
            round_to_power_of_two=round_to_power_of_two,
            blackman_coeff=blackman_coeff, snip_edges=snip_edges)
        self.num_bins = num_bins
        self.low_freq = low_freq
        self.high_freq = high_freq
        self.vtln_low = vtln_low
        self.vtln_high = vtln_high

    @property
    def num_bins(self):
        """Count of triangular filters in the mel bank (minimum 3)"""
        return self._num_bins

    @num_bins.setter
    def num_bins(self, value):
        self._num_bins = int(value)

    @property
    def low_freq(self):
        """Lowest edge of the mel filterbank (Hz)"""
        return np.float32(self._low_freq)

    @low_freq.setter
    def low_freq(self, value):
        self._low_freq = float(value)

    @property
    def high_freq(self):
        """Highest edge of the mel filterbank (Hz)

        Non-positive values count down from the Nyquist frequency.

        """
        return np.float32(self._high_freq)

    @high_freq.setter
    def high_freq(self, value):
        self._high_freq = float(value)

    @property
    def vtln_low(self):
        """Lower knee (Hz) of the piecewise-linear VTLN warp"""
        return np.float32(self._vtln_low)

    @vtln_low.setter
    def vtln_low(self, value):
        self._vtln_low = float(value)

    @property
    def vtln_high(self):
        """Upper knee (Hz) of the piecewise-linear VTLN warp

        Negative values count down from high_freq.

        """
        return np.float32(self._vtln_high)

    @vtln_high.setter
    def vtln_high(self, value):
        self._vtln_high = float(value)

    def mel_options(self):
        """The current mel parameters as a static MelOpts"""
        return MelOpts(
            num_bins=self._num_bins,
            low_freq=self._low_freq,
            high_freq=self._high_freq,
            vtln_low=self._vtln_low,
            vtln_high=self._vtln_high)

    def mel_weights(self, vtln_warp):
        """Dense mel filterbank matrix for the given VTLN warp"""
        from shennong_tpu.ops import mel as melmod
        opts = self.frame_options()
        weights, _ = melmod.mel_banks(
            self._num_bins, opts.padded_window_size, opts.sample_rate,
            self._low_freq, self._high_freq, self._vtln_low,
            self._vtln_high, float(vtln_warp))
        return weights

    @abc.abstractmethod
    def _compute(self, signal, vtln_warp):  # pragma: nocover
        """Subclass hook computing the [nframes, ndims] data matrix"""

    def process(self, signal, vtln_warp=1.0):
        """Compute features, with optional VTLN warping.

        Parameters
        ----------
        signal : Audio, shape = [nsamples, 1]
            Mono audio at the processor's sample rate.
        vtln_warp : float, optional
            VTLN warp factor, 1.0 (default) means no warping.

        Returns
        -------
        features : Features, shape = [nframes, ndims]
        """
        self._check_signal(signal)
        chunked = self._maybe_chunk(signal, vtln_warp=vtln_warp)
        if chunked is not None:
            return chunked
        data = self._compute(signal, vtln_warp)
        return Features(
            data, self.times(data.shape[0]),
            properties=self.get_properties(vtln_warp=vtln_warp))
