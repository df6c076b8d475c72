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


class Counters:
    """Process-global performance counters for the extraction plane.

    The end-to-end benchmark (``bench.py``) reads these to decompose a
    corpus run into its cost centers — so a regressed number can be
    attributed to the pipeline or to host/link weather without rerunning
    under a profiler. Keys written by the instrumented seams:

    - ``decode_s``: host audio decode (CPU-thread seconds: decoding
      overlaps the device work, so this can exceed its wall share);
    - ``dispatch_s`` / ``dispatches``: wall seconds and count of device
      program dispatches (through a relay each dispatch blocks for the
      transport round trip);
    - ``fetch_s`` / ``bytes_down``: wall seconds blocked fetching device
      outputs, and the fetched volume;
    - ``bytes_up``: host->device upload volume (int16-packed signals);
    - ``pass2_s``: host pass 2 (CMVN apply + delta + assembly).
      Thread seconds, like ``decode_s``: pass 2 runs per CMVN group on
      a worker thread overlapped with the in-flight batch fetches
      (``pipeline._overlapped_fused_extract``), so it can exceed its
      wall share.

    ``dispatch_s + fetch_s`` is the wall time provably spent waiting
    on the device path — the relay-sensitive share. Actual on-device
    execution time is NOT a counter: the benchmark measures it with a
    ``jax.profiler`` trace (one instrumented pass) and reports it as
    ``device_xrt``; the fetched-bytes-over-fetch-seconds ratio is
    reported per run as the observed relay bandwidth.
    """

    def __init__(self):
        import threading
        self._data = {}
        self._lock = threading.Lock()  # decode runs on pool threads

    def reset(self):
        with self._lock:
            self._data.clear()

    def add(self, key, value=1.0):
        with self._lock:
            self._data[key] = self._data.get(key, 0.0) + value

    @contextlib.contextmanager
    def timed(self, key):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.add(key, time.perf_counter() - start)

    def snapshot(self):
        with self._lock:  # decode threads may be inserting keys
            return dict(self._data)


#: The process-global counter set (reset it around a measured region).
counters = Counters()
