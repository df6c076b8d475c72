"""Speech feature extraction processors (Audio -> Features).

Mirrors the processor registry of the reference toolbox
(``shennong/processor/__init__.py``).
"""

from shennong_tpu.processor.spectrogram import SpectrogramProcessor
from shennong_tpu.processor.filterbank import FilterbankProcessor
from shennong_tpu.processor.mfcc import MfccProcessor
from shennong_tpu.processor.energy import EnergyProcessor
