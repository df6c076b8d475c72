"""Bottleneck features from the BUT/Phonexia pre-trained networks.

API-compatible with ``shennong/processor/bottleneck.py``; the
filterbank front-end and the stacked-bottleneck MLP run as jitted JAX
computations (:mod:`shennong_tpu.models.bottleneck`).

The pre-trained weight files (FisherMono / FisherTri / BabelMulti,
distributed separately by the reference as well) are looked up under
``shennong_tpu/share/bottleneck/<name>.npz``; drop the converted BUT
npz files there to enable the corresponding networks.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from shennong_tpu import Features
from shennong_tpu.logger import get_logger
from shennong_tpu.models import bottleneck as bn
from shennong_tpu.processor.base import FeaturesProcessor

_WEIGHTS_FILES = {
    'BabelMulti': 'Babel-ML17_FBANK_HL1500_SBN80_PhnStates3096',
    'FisherMono': 'FisherEnglish_FBANK_HL500_SBN80_PhnStates120',
    'FisherTri': 'FisherEnglish_FBANK_HL500_SBN80_triphones2423',
}

_SHARE_DIR = os.path.join(
    os.path.dirname(__file__), '..', 'share', 'bottleneck')


class BottleneckProcessor(FeaturesProcessor):
    """Bottleneck features from a pre-trained neural network

    Parameters
    ----------
    weights : 'BabelMulti', 'FisherMono' or 'FisherTri'
        The pretrained weights to use for features extraction
    dither : float, optional
        Amount of dither added before the filterbank, default 0.1

    Raises
    ------
    ValueError
        If the ``weights`` name is invalid
    RuntimeError
        If the corresponding weights file is not installed
    """

    # weights loaded once per process, shared across instances
    _loaded_weights = {}

    def __init__(self, weights='BabelMulti', dither=0.1):
        super().__init__()
        self.weights = weights
        self.dither = dither

    @property
    def name(self):
        return 'bottleneck'

    @property
    def dither(self):
        """Amount of dithering

        0.0 means no dither

        """
        return self._dither

    @dither.setter
    def dither(self, value):
        self._dither = float(value)

    @property
    def weights(self):
        """The name of the pretrained weights used to extract the features

        Must be 'BabelMulti', 'FisherMono' or 'FisherTri'.

        """
        return self._weights

    @weights.setter
    def weights(self, value):
        if value not in _WEIGHTS_FILES:
            raise ValueError(
                'invalid weights "{}", choose in "{}"'.format(
                    value, ', '.join(sorted(_WEIGHTS_FILES))))
        self._weights = value

    @property
    def ndims(self):
        """The dimension of extracted frames

        Cannot be tuned because the underlying neural networks are
        trained with this parameter.

        """
        return 80

    @property
    def sample_rate(self):
        """Processing sample frequency in Hertz

        Cannot be tuned because the underlying neural networks are
        trained with this parameter.

        """
        return 8000

    @property
    def frame_length(self):
        """The length of extracted frames (in seconds)"""
        return 0.025

    @property
    def frame_shift(self):
        """The time shift between two consecutive frames (in seconds)"""
        return 0.01

    @classmethod
    def available_weights(cls):
        """The installed weights files as a dict name -> path.

        Raises RuntimeError when no weights file at all is found.
        """
        directory = os.path.abspath(_SHARE_DIR)
        expected = {
            name: os.path.join(directory, filename + '.npz')
            for name, filename in _WEIGHTS_FILES.items()}
        files = {
            name: path for name, path in expected.items()
            if os.path.isfile(path)}
        if not files:
            raise RuntimeError(
                'no weights file found in {}, install the BUT/Phonexia '
                'npz files to enable bottleneck features'.format(
                    directory))
        for name in expected:
            if name not in files:
                get_logger('bottleneck', 'warning').warning(
                    'weights file for "%s" is unavailable', name)
        return files

    def _get_weights(self):
        if self.weights not in self._loaded_weights:
            available = self.available_weights()
            if self.weights not in available:
                # the class contract (and the reference behavior):
                # RuntimeError when the selected weights file is not
                # installed, even if others are
                raise RuntimeError(
                    'weights file for "{}" is not installed (found: '
                    '{})'.format(
                        self.weights, ', '.join(sorted(available))))
            weights_file = available[self.weights]
            self.log.info('loading %s', os.path.basename(weights_file))
            with np.load(weights_file) as data:
                self._loaded_weights[self.weights] = {
                    k: v for k, v in data.items()}
        return self._loaded_weights[self.weights]

    def _prepare(self, signal):
        """Host-side front end: resample, VAD, HTK fbank, voiced mean
        normalization, context DCT compression. Returns the network
        input matrix [rows, D] (float32)."""
        # resample to 8 kHz / 16 bit
        if (signal.sample_rate != 8000
                or signal.dtype is not np.dtype(np.int16)):
            self.log.debug(
                'resampling audio from %dHz@%db to %dHz@%db',
                signal.sample_rate, signal.dtype.itemsize * 8, 8000, 16)
            signal = signal.resample(8000).astype(np.int16)

        data = signal.data
        frame_length, frame_overlap = 200, 120
        frame_shift = frame_length - frame_overlap

        vad = bn.compute_vad(
            data, self.log, win_length=frame_length,
            win_overlap=frame_overlap)
        voiced = int(vad.sum())
        if not voiced:
            raise RuntimeError(
                'no voice detected in signal, failed to extract features')
        self.log.debug(
            '%d frames of speech detected (on %d total frames)',
            voiced, len(vad))

        # dither and mel filterbank
        dithered = data + self.dither * (
            np.random.rand(*data.shape) * 2 - 1)
        window_vec = np.hamming(frame_length).astype(np.float32)
        bank = bn.mel_filterbank_htk(
            frame_length, 8000, num_chans=24, low_freq=64.0,
            high_freq=3800.0)
        frames = bn.frame_signal(
            dithered.astype(np.float32), frame_length, frame_shift)
        from shennong_tpu.ops.framing import bucket_size
        nrows = frames.shape[0]
        row_bucket = bucket_size(nrows, minimum=128)
        if row_bucket > nrows:
            frames = np.pad(frames, ((0, row_bucket - nrows), (0, 0)))
        fea = np.asarray(bn.fbank_htk(
            jnp.asarray(frames), jnp.asarray(window_vec),
            jnp.asarray(bank), 256))[:nrows]

        # mean normalization over voiced frames
        fea = fea - fea[vad].mean(axis=0)

        # global +-15 frame context, then the network
        fea = np.concatenate([
            np.repeat(fea[:1], 15, axis=0), fea,
            np.repeat(fea[-1:], 15, axis=0)], axis=0)

        weights = self._get_weights()
        return bn.preprocess_nn_input(fea, int(weights['context']))

    def _params(self):
        return {
            k: jnp.asarray(v) for k, v in self._get_weights().items()
            if k != 'context'}

    def _emit(self, output):
        """Wrap one utterance's network output as Features."""
        frame_length, frame_shift = 200, 80
        times = (1.0 / 8000) * np.vstack((
            np.arange(output.shape[0]) * frame_shift,
            np.arange(output.shape[0]) * frame_shift
            + frame_length)).T
        return Features(
            output.astype(np.float64), times, self.get_properties())

    def process(self, signal):
        """Compute bottleneck features on an audio ``signal``.

        The signal is resampled to 8 kHz int16; output frames have a
        10 ms shift, 25 ms length and 80 dimensions. Raises
        RuntimeError when the VAD finds no speech.
        """
        nn_input = self._prepare(signal)

        # the stagger stacking consumes 20 rows of context; shorter
        # audio has no output frames (the reference's unpadded slices
        # come out empty) — without this check, bucket padding would
        # emit padding-derived garbage rows instead
        true_rows = nn_input.shape[0]
        if true_rows <= 20:
            return self._emit(
                np.zeros((0, 80), dtype=np.float32))

        # pad the frame count to a bucket (single compile per bucket);
        # the stagger stacking is causal-bounded so rows beyond the
        # true count never contaminate the sliced output
        from shennong_tpu.ops.framing import bucket_size
        bucket = bucket_size(true_rows, minimum=128)
        if bucket > true_rows:
            nn_input = np.pad(
                nn_input, ((0, bucket - true_rows), (0, 0)))
        output = np.asarray(bn.stacked_bn_forward(
            self._params(), jnp.asarray(nn_input)))[:true_rows - 20]
        return self._emit(output)

    def process_all(self, utterances, njobs=None, **kwargs):
        """Batched extraction: utterances sharing a row bucket run the
        stacked network as one vmapped forward (the stagger stacking
        mixes rows within an utterance, so batching uses a batch axis,
        never concatenation)."""
        if kwargs:
            return super().process_all(utterances, njobs=njobs, **kwargs)

        from shennong_tpu import FeaturesCollection
        from shennong_tpu.ops.framing import bucket_size
        from shennong_tpu.parallel import mesh as meshing

        prepared = {
            utt.name: self._prepare(utt.load_audio())
            for utt in utterances}

        groups = {}
        for name, nn_input in prepared.items():
            groups.setdefault(
                bucket_size(nn_input.shape[0], minimum=128),
                []).append(name)

        params = self._params()
        forward = jax.jit(jax.vmap(
            bn.stacked_bn_forward, in_axes=(None, 0)))

        # on a device mesh the batch (utterance) axis shards over the
        # 'data' axis: rows pad to a mesh multiple (zero inputs whose
        # outputs are dropped), per-row outputs are mesh-invariant
        mesh = meshing.get_default_mesh()
        row_multiple = mesh.devices.size if mesh is not None else 1

        collection = FeaturesCollection()
        for bucket, names in groups.items():
            rows = -(-len(names) // row_multiple) * row_multiple
            stacked = np.zeros(
                (rows, bucket, prepared[names[0]].shape[1]),
                dtype=np.float32)
            for row, name in enumerate(names):
                inp = prepared[name]
                stacked[row, :inp.shape[0]] = inp
            if mesh is not None:
                dev_input = jax.device_put(
                    stacked, meshing.batch_sharding(mesh))
            else:
                dev_input = jnp.asarray(stacked)
            outputs = np.asarray(forward(params, dev_input))
            for row, name in enumerate(names):
                # <= 20 rows: no output frames (the stagger stacking
                # consumes 20 rows of context), never padding-derived
                # garbage
                count = max(prepared[name].shape[0] - 20, 0)
                collection[name] = self._emit(outputs[row, :count])
        return collection
