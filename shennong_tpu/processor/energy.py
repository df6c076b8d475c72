"""Per-frame energy extraction (the C0 of MFCC/PLP, standalone).

Replaces the per-frame ``kaldi.feat.window.extract_window`` loop of
the reference (``shennong/processor/energy.py:172-183``) with the
batched :func:`shennong_tpu.ops.spectral.energy_batch`.
"""

import numpy as np

from shennong_tpu import Features
from shennong_tpu.ops.spectral import EnergyOpts, energy_batch
from shennong_tpu.processor.base import FramesProcessor

_COMPRESSIONS = ('off', 'log', 'sqrt')


class EnergyProcessor(FramesProcessor):
    """Frame energy with optional log/sqrt compression"""

    def __init__(self, sample_rate=16000, frame_shift=0.01,
                 frame_length=0.025, dither=1.0, preemph_coeff=0.97,
                 remove_dc_offset=True, window_type='povey',
                 round_to_power_of_two=True, blackman_coeff=0.42,
                 snip_edges=True, raw_energy=True, compression='log'):
        super().__init__(
            sample_rate=sample_rate, frame_shift=frame_shift,
            frame_length=frame_length, dither=dither,
            preemph_coeff=preemph_coeff,
            remove_dc_offset=remove_dc_offset, window_type=window_type,
            round_to_power_of_two=round_to_power_of_two,
            blackman_coeff=blackman_coeff, snip_edges=snip_edges)

        self.compression = compression
        self.raw_energy = raw_energy

    @property
    def name(self):
        return 'energy'

    @property
    def ndims(self):
        return 1

    @property
    def compression(self):
        """Compression applied to the frame energies

        One of 'log' (natural log), 'sqrt', or 'off' (linear).

        """
        return self._compression

    @compression.setter
    def compression(self, value):
        if value not in _COMPRESSIONS:
            raise ValueError(
                'compression must be in {}, it is {}'.format(
                    ', '.join(_COMPRESSIONS), value))
        self._compression = value

    @property
    def raw_energy(self):
        """Measure energy on the raw frame, prior to pre-emphasis
        and windowing"""
        return self._raw_energy

    @raw_energy.setter
    def raw_energy(self, value):
        self._raw_energy = bool(value)

    def options(self):
        """All parameters bundled as a static EnergyOpts"""
        import dataclasses
        frame = self.frame_options()
        if self._raw_energy:
            frame = dataclasses.replace(
                frame, preemph_coeff=0.0, window_type='rectangular')
        return EnergyOpts(
            frame=frame, raw_energy=self._raw_energy,
            compression=self._compression)

    def process(self, signal):
        """Compute the compressed frame energies of ``signal``.

        With ``raw_energy`` the pre-emphasis and window are disabled
        (the reference achieves this by temporarily overriding the
        parameters, we bake it into the static options).
        """
        self._check_signal(signal)
        chunked = self._maybe_chunk(signal)
        if chunked is not None:
            return chunked

        opts = self.options()

        signals, nsamples, nframes, nframes_max, key = (
            self._signal_batch(signal))
        if nframes == 0:
            data = np.zeros((0, 1))
        else:
            energy = energy_batch(
                signals, nsamples, opts, nframes_max,
                compression=self._compression, key=key)
            data = np.asarray(
                energy[0, :nframes], dtype=np.float64)[:, None]

        return Features(
            data, self.times(data.shape[0]), self.get_properties())
