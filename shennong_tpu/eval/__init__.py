"""Feature-quality evaluation: ABX phone discriminability.

The reference toolbox's headline quality numbers are ABX
discrimination error rates computed by external tooling (ABXpy) on
features it extracts (reference ``doc/source/intro_features.rst``
tables; ``examples/features_abx/run.sh`` prepares the inputs). This
subpackage provides an in-framework ABX evaluator — batched DTW
divergences as one device program, machine-ABX scoring on the host —
so feature quality is measurable end to end without external tools.
"""

from shennong_tpu.eval.abx import (  # noqa: F401
    abx_error, dtw_divergences, pairwise_distances,
    segments_from_alignment)
