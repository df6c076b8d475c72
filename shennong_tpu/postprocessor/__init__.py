"""Feature post-processors (Features -> Features)."""

from shennong_tpu.postprocessor.cmvn import (
    CmvnPostProcessor, SlidingWindowCmvnPostProcessor, apply_cmvn)
from shennong_tpu.postprocessor.delta import DeltaPostProcessor
from shennong_tpu.postprocessor.vad import VadPostProcessor
