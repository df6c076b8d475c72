"""Batched, multi-device execution of feature extraction.

Replaces the reference's per-utterance joblib thread pools
(``shennong/processor/base.py:104-107``,
``shennong/pipeline.py:545-565``) with padded length-bucketed batches
executed as single XLA programs, optionally sharded over a
``jax.sharding.Mesh`` data axis (per-utterance data parallelism over
TPU chips; global statistics such as CMVN reduce with psum).
"""

from shennong_tpu.parallel.executor import BatchExecutor
from shennong_tpu.parallel.mesh import (
    data_mesh, get_default_mesh, set_default_mesh)
