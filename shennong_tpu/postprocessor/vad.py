"""Energy-based voice activity detection post-processor.

API-compatible with ``shennong/postprocessor/vad.py``; the decision
runs as a batched windowed vote on device
(:func:`shennong_tpu.ops.postops.compute_vad_energy`). The input's
first column is assumed to be a log-energy (as produced by
EnergyProcessor, MFCC or PLP with ``use_energy``).
"""

import numpy as np

from shennong_tpu import Features
from shennong_tpu.ops import postops
from shennong_tpu.postprocessor.base import FeaturesPostProcessor


class VadPostProcessor(FeaturesPostProcessor):
    """Computes VAD on speech features"""

    def __init__(self, energy_threshold=5.0, energy_mean_scale=0.5,
                 frames_context=0, proportion_threshold=0.6):
        super().__init__()
        self.energy_threshold = energy_threshold
        self.energy_mean_scale = energy_mean_scale
        self.frames_context = frames_context
        self.proportion_threshold = proportion_threshold

    @property
    def name(self):
        return 'vad'

    @property
    def energy_threshold(self):
        """Base value of the voicing energy cutoff

        The actual cutoff also includes the scaled mean log-energy,
        see energy_mean_scale.

        """
        return np.float32(self._energy_threshold)

    @energy_threshold.setter
    def energy_threshold(self, value):
        self._energy_threshold = float(value)

    @property
    def energy_mean_scale(self):
        """Weight of the utterance mean log-energy in the cutoff

        The decision threshold is energy_threshold + scale * mean;
        must be non-negative.

        """
        return np.float32(self._energy_mean_scale)

    @energy_mean_scale.setter
    def energy_mean_scale(self, value):
        if value < 0:
            raise ValueError(
                'Energy mean scale must be >= 0, it is {}'.format(value))
        self._energy_mean_scale = float(value)

    @property
    def frames_context(self):
        """Half-width of the voting window, in frames

        Each decision looks at 2 * frames_context + 1 frames; must be
        non-negative.

        """
        return self._frames_context

    @frames_context.setter
    def frames_context(self, value):
        if value < 0:
            raise ValueError(
                'frames_context must be >= 0, it is {}'.format(value))
        self._frames_context = int(value)

    @property
    def proportion_threshold(self):
        """Fraction of the voting window that must exceed the cutoff

        Strictly between 0 and 1.

        """
        return np.float32(self._proportion_threshold)

    @proportion_threshold.setter
    def proportion_threshold(self, value):
        if value <= 0 or value >= 1:
            raise ValueError(
                'proportion_threshold must be in ]0, 1[, it is {}'
                .format(value))
        self._proportion_threshold = float(value)

    @property
    def ndims(self):
        return 1

    def process(self, features):
        """Per-frame voicing decision from the log-energy column.

        Returns uint8 features with 1 for voiced frames, 0 otherwise.
        """
        padded, nframes = postops.pad_frame_axis(features.data[:, :1])
        log_energy = padded[:, :, 0]
        vad = postops.compute_vad_energy(
            log_energy, nframes,
            energy_threshold=self._energy_threshold,
            energy_mean_scale=self._energy_mean_scale,
            frames_context=self._frames_context,
            proportion_threshold=self._proportion_threshold)
        return Features(
            np.asarray(
                vad[0, :features.nframes], dtype=np.uint8)[:, None],
            features.times, properties=self.get_properties(features))

    def process_all(self, features_collection, njobs=None):
        """Voicing decisions for a whole collection.

        Utterances are grouped into padded masked batches: O(buckets)
        device programs instead of one per utterance. Returns a
        FeaturesCollection keyed like the input.
        """
        from shennong_tpu import FeaturesCollection

        names = list(features_collection.keys())
        arrays = [features_collection[n].data[:, :1] for n in names]
        out = FeaturesCollection()
        for chunk, stacked, nframes in postops.batch_ragged(arrays):
            vad = np.asarray(postops.compute_vad_energy(
                stacked[:, :, 0], nframes,
                energy_threshold=self._energy_threshold,
                energy_mean_scale=self._energy_mean_scale,
                frames_context=self._frames_context,
                proportion_threshold=self._proportion_threshold))
            for row, index in enumerate(chunk):
                features = features_collection[names[index]]
                out[names[index]] = Features(
                    vad[row, :features.nframes].astype(
                        np.uint8)[:, None],
                    features.times,
                    properties=self.get_properties(features))
        return out
