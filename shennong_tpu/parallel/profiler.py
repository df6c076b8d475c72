"""Tracing and per-stage timing (the observability layer the
reference lacks, see SURVEY §5).

Two facilities:

- :class:`StageTimer`: lightweight wall-clock accounting of pipeline
  stages, reported through a logger (x real-time per stage);
- :func:`trace`: a context manager around ``jax.profiler`` producing a
  TensorBoard-compatible device trace of the XLA programs.
"""

import contextlib
import time

from shennong_tpu.logger import null_logger


class StageTimer:
    """Accumulates wall-clock time per named pipeline stage."""

    def __init__(self, log=null_logger()):
        self._log = log
        self._stages = {}

    @contextlib.contextmanager
    def stage(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self._stages[name] = self._stages.get(name, 0.0) + elapsed

    def report(self, audio_seconds=None):
        """Log one line per stage; with ``audio_seconds`` also log the
        per-stage real-time factor. Returns the timing dict."""
        total = sum(self._stages.values())
        for name, elapsed in sorted(
                self._stages.items(), key=lambda kv: -kv[1]):
            if audio_seconds:
                self._log.info(
                    'stage %-20s %8.3fs (%5.1f%%, %8.0fx real-time)',
                    name, elapsed, 100 * elapsed / max(total, 1e-9),
                    audio_seconds / max(elapsed, 1e-9))
            else:
                self._log.info(
                    'stage %-20s %8.3fs (%5.1f%%)',
                    name, elapsed, 100 * elapsed / max(total, 1e-9))
        return dict(self._stages)


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace under ``logdir`` (TensorBoard format).

    Wrap any extraction call::

        with profiler.trace('/tmp/trace'):
            features = executor.process_all(utterances)
    """
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
