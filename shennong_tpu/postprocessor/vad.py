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
        """Constant term in energy threshold for MFCC0 for VAD

        See also :func:`energy_mean_scale`

        """
        return np.float32(self._energy_threshold)

    @energy_threshold.setter
    def energy_threshold(self, value):
        self._energy_threshold = float(value)

    @property
    def energy_mean_scale(self):
        """Scale factor of the mean log-energy

        If this is set to `s`, to get the actual threshold we let `m`
        be the mean log-energy of the file, and use `s*m +`
        :func:`energy_threshold`. Must be greater or equal to 0.

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
        """Number of frames of context on each side of central frame

        The size of the window for which energy is monitored is
        `2 * frames_context + 1`. Must be greater or equal to 0.

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
        """Proportion of frames beyond the energy threshold

        Parameter controlling the proportion of frames within the
        window that need to have more energy than the threshold. Must
        be in ]0, 1[.

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
