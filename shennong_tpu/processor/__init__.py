"""Speech feature extraction processors (Audio -> Features).

Mirrors the processor registry of the reference toolbox
(``shennong/processor/__init__.py``).
"""

from shennong_tpu.processor.spectrogram import SpectrogramProcessor
from shennong_tpu.processor.filterbank import FilterbankProcessor
from shennong_tpu.processor.mfcc import MfccProcessor
from shennong_tpu.processor.plp import PlpProcessor
from shennong_tpu.processor.energy import EnergyProcessor
from shennong_tpu.processor.pitch_kaldi import (
    KaldiPitchProcessor, KaldiPitchPostProcessor)
from shennong_tpu.processor.pitch_crepe import (
    CrepePitchProcessor, CrepePitchPostProcessor)
from shennong_tpu.processor.bottleneck import BottleneckProcessor
from shennong_tpu.processor.onehot import (
    OneHotProcessor, FramedOneHotProcessor)
from shennong_tpu.processor.ubm import DiagUbmProcessor
from shennong_tpu.processor.vtln import VtlnProcessor
