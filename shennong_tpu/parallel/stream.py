"""Streaming host data plane: bounded double-buffered batch prefetch.

The reference loads audio lazily per joblib task
(``shennong/pipeline.py:545-565``: every thread decodes its own
utterance right before computing on it), so host RSS stays bounded but
IO never overlaps across the pool barrier. The first TPU rebuild went
to the other extreme: :func:`shennong_tpu.parallel.batch.load_signals`
decoded the *whole* corpus into host RAM before the first device
dispatch (~9 GB for the reference's 38 h Buckeye benchmark corpus).

This module replaces both with a streaming plan:

* **plan** — utterances are partitioned into padded batches using only
  their scanned metadata (:meth:`Audio.scan` header reads, no decode),
  sorted by length so batches waste little padding;
* **prefetch** — a small thread pool decodes at most ``depth``
  batches ahead of the consumer. While the device computes batch N
  (and the consumer blocks fetching its results), host threads decode
  batches N+1..N+depth. Peak audio RSS is bounded by
  ``(depth + 1) * batch_bytes`` regardless of corpus size.

Batch payloads are identical to
:func:`shennong_tpu.parallel.batch.make_batches`:
``(names, signals [B, T], nsamples [B], nvalid)``.
"""

import concurrent.futures
import threading

import numpy as np

from shennong_tpu import native
from shennong_tpu.ops.framing import bucket_size


class _BufferPool:
    """Recycled padded-batch buffers, keyed by (shape, dtype).

    Fresh page faults cost ~1 ms per 4 KiB page on some virtualized
    hosts (measured: filling a new 25 MB batch buffer takes seconds
    the first time and ~10 ms once the pages exist), so batch buffers
    are touched once and reused. Consumers hand buffers back through
    :func:`recycle` after the device upload of the batch is complete;
    unreturned buffers are simply garbage collected.
    """

    def __init__(self, max_per_key=4, max_keys=32):
        self._free = {}
        self._max = max_per_key
        self._max_keys = max_keys
        self._lock = threading.Lock()
        # the boundedness claim of this module, as a measurement:
        # outstanding (taken, not yet recycled) + pooled bytes, and
        # the high-water mark of their sum. An unreturned buffer
        # counts as outstanding until process exit — a conservative
        # upper bound on the audio plane's footprint.
        self._outstanding = 0
        self._pooled = 0
        self.peak_bytes = 0

    def take(self, shape, dtype):
        key = (tuple(shape), np.dtype(dtype).str)
        with self._lock:
            stack = self._free.get(key)
            if stack:
                buffer = stack.pop()
                if not stack:
                    del self._free[key]  # keep insertion order fresh
                self._pooled -= buffer.nbytes
                self._outstanding += buffer.nbytes
                return buffer
            buffer = np.empty(shape, dtype)
            self._outstanding += buffer.nbytes
            self.peak_bytes = max(
                self.peak_bytes, self._outstanding + self._pooled)
            return buffer

    def give(self, array):
        if not isinstance(array, np.ndarray) or array.base is not None:
            return  # only whole, owned buffers are reusable
        key = (array.shape, array.dtype.str)
        with self._lock:
            self._outstanding = max(
                0, self._outstanding - array.nbytes)
            stack = self._free.setdefault(key, [])
            if len(stack) < self._max:
                stack.append(array)
                self._pooled += array.nbytes
            # a long-lived service over many corpus geometries must
            # not hoard buffers for shapes it will never see again:
            # evict the least-recently-refreshed keys beyond the cap
            while len(self._free) > self._max_keys:
                oldest = next(iter(self._free))
                if oldest == key:
                    break
                self._pooled -= sum(
                    b.nbytes for b in self._free[oldest])
                del self._free[oldest]

    def reset_peak(self):
        """Restart the high-water mark from the current footprint."""
        with self._lock:
            self.peak_bytes = self._outstanding + self._pooled


_pool = _BufferPool()


def recycle(array):
    """Return a batch buffer to the pool for reuse.

    Call this once the batch's device upload has completed (e.g.
    after fetching the batch's results) — never while a transfer may
    still be reading the buffer.
    """
    _pool.give(array)


def pool_peak_bytes():
    """High-water mark of the host audio plane, in bytes: the most
    batch-buffer memory (outstanding + pooled) ever alive at once.
    This is the module's boundedness promise as a number — it must
    stay at ~(depth + 1) padded batches no matter the corpus size."""
    return _pool.peak_bytes


def pool_reset_peak():
    """Restart :func:`pool_peak_bytes` from the current footprint."""
    _pool.reset_peak()


def _scan_count(utt):
    """Utterance sample count from header metadata only (no decode)."""
    from shennong_tpu.audio import Audio
    meta = Audio.scan(utt.audio_file)
    if utt.tstart is None:
        return meta.nsamples
    start = int(utt.tstart * meta.sample_rate)
    return int(utt.tstop * meta.sample_rate) - start


def streamed_order(utterances):
    """Indices of ``utterances`` in streaming order.

    The order their rows appear in the concatenated stream output:
    sorted by scanned sample count, ties keeping collection order
    (stable sort). Distributed training indexes the GLOBAL voiced
    frame sequence against this order, so it is the single source of
    truth shared with :func:`plan_batches`.
    """
    utterances = list(utterances)
    return sorted(range(len(utterances)),
                  key=lambda i: _scan_count(utterances[i]))


def plan_batches(utterances, batch_size, pad_to_multiple=1):
    """Partition utterances into batch plans without decoding audio.

    Returns a list of (utterance_chunk, rows) with utterances sorted
    by scanned length — same grouping policy as
    :func:`~shennong_tpu.parallel.batch.make_batches`, driven by
    header metadata instead of decoded signals.
    """
    utterances = list(utterances)
    order = streamed_order(utterances)
    plans = []
    for start in range(0, len(order), batch_size):
        chunk = [utterances[i] for i in order[start:start + batch_size]]
        rows = len(chunk)
        if rows % pad_to_multiple:
            rows += pad_to_multiple - rows % pad_to_multiple
        plans.append((chunk, rows))
    return plans


def _native_plan(chunk):
    """(paths, starts, counts) when every utterance is a mono PCM16
    WAV the native int16 fast path can load, else None."""
    from shennong_tpu.parallel.batch import _utterance_bounds

    if not native.available():
        return None
    paths, starts, counts = [], [], []
    for utt in chunk:
        scan = native.wav_scan2(utt.audio_file)
        if scan is None:
            return None
        channels, rate, nsamples, fmt, bits = scan
        if channels != 1 or fmt != 1 or bits != 16:
            return None
        start, count = _utterance_bounds(utt, rate)
        if count is None:
            count = nsamples - start
        paths.append(utt.audio_file)
        starts.append(start)
        counts.append(count)
    return paths, starts, counts


def decode_batch(chunk, rows, njobs=4):
    """Decode one batch plan into the padded upload payload.

    Mono PCM16 WAV corpora (the overwhelming case) decode through the
    native loader straight into a pooled [rows, bucket] int16 buffer:
    one buffer allocation per shape for the whole run, and the int16
    rows upload at half the float32 bytes. Everything else takes the
    float32 path, whose padded length is a geometric bucket of the
    *decoded* maximum (scan estimates for compressed formats can be
    off by a few samples; the decoded truth keeps payloads exact).
    """
    from shennong_tpu.parallel.profiler import counters

    with counters.timed('decode_s'):
        return _decode_batch(chunk, rows, njobs)


def _decode_batch(chunk, rows, njobs=4):
    from shennong_tpu.parallel import batch as batching

    plan = _native_plan(chunk)
    if plan is not None:
        paths, starts, counts = plan
        nvalid = len(chunk)
        stride = bucket_size(max(counts))
        buf = _pool.take((rows, stride), np.int16)
        loaded = native.load_wav_batch_i16(
            paths, starts, counts, stride, out=buf[:nvalid])
        if loaded is not None:
            _, out_counts = loaded
            buf[nvalid:] = 0
            nsamples = np.full(rows, 1, dtype=np.int32)
            nsamples[:nvalid] = out_counts
            names = [utt.name for utt in chunk]
            return names, buf, nsamples, nvalid

    items = batching.load_signals(chunk, njobs=njobs)

    nvalid = len(items)
    max_len = bucket_size(max(len(sig) for _, sig in items))
    signals = _pool.take((rows, max_len), np.float32)
    nsamples = np.full(rows, 1, dtype=np.int32)
    names = []
    for row, (name, sig) in enumerate(items):
        signals[row, :len(sig)] = sig
        signals[row, len(sig):] = 0.0
        nsamples[row] = len(sig)
        names.append(name)
    signals[nvalid:] = 0.0
    return names, signals, nsamples, nvalid


def as_int16_if_lossless(signals):
    """The int16 view of integer-valued audio, else the input.

    Integer-valued rows (always true for PCM WAV) upload at half the
    float32 bytes, and the device kernels accept int16 natively.
    """
    if signals.dtype == np.int16 or not isinstance(
            signals, np.ndarray):
        return signals
    as_i16 = signals.astype(np.int16)
    return as_i16 if np.array_equal(as_i16, signals) else signals


def stream_source(signal_cache, utterances, batch_size,
                  pad_to_multiple=1, njobs=4, depth=2):
    """The batch stream for a corpus sweep: the cache when one is
    given, plain host streaming otherwise. Shared by every consumer
    (executors, the GMM/VTLN front-end)."""
    if signal_cache is not None:
        return signal_cache.stream(
            utterances, batch_size, pad_to_multiple,
            njobs=njobs, depth=depth)
    return stream_batches(
        utterances, batch_size, pad_to_multiple,
        njobs=njobs, depth=depth)


class SignalCache:
    """Device-resident cache of a corpus's uploaded signal batches.

    One VTLN training flow streams the same audio three or four times
    (UBM front-end, VTLN front-end, the 41-warp moment pass, the final
    warped extraction — the reference re-extracts per pass too,
    ``shennong/processor/vtln.py:614-627``). The decoded bytes are
    identical every pass, so the first :meth:`stream` call uploads the
    batches once and later calls replay the retained device arrays:
    no decode, no host buffers, no host-device transfer.

    Retention is capped at ``max_bytes`` of device memory across ALL
    retained entries; a corpus exceeding the remaining budget streams
    normally on every pass (the cache is purely an optimization,
    never a semantic change). Batches with integer-valued audio are
    uploaded as int16 — half the transfer bytes, and the device
    kernels accept int16 rows natively.

    Replayed ``signals`` are ``jax.Array``s: :func:`recycle` ignores
    them and ``jax.device_put`` of an already-placed array is free, so
    consumers need no special handling. Replayed batches re-chunk to
    the consumer's ``batch_size`` (recorded groupings can be larger
    than a consumer's memory bound — e.g. the 42-way warp fan-out
    sizes its batches to the fused program's footprint).
    """

    def __init__(self, max_bytes=1 << 30, depth=2):
        self._entries = {}
        self._oversize = set()
        self._max_bytes = int(max_bytes)
        self._bytes = 0
        self._depth = max(1, int(depth))

    @staticmethod
    def _key(utterances, pad_to_multiple):
        # names alone would collide for duration-fitted segments of
        # the same corpus (same names, different bounds)
        return (tuple(sorted(
            (u.name, u.audio_file, u.tstart or 0.0, u.tstop or 0.0)
            for u in utterances)), int(pad_to_multiple))

    @staticmethod
    def _rechunk(batch, batch_size, pad_to_multiple):
        """Split a recorded batch into consumer-sized row chunks.

        Chunk row counts stay multiples of ``pad_to_multiple``
        (sharded consumers need divisible batches); device-array row
        slices are cheap views materialized on device. Padding-only
        tails are dropped — no consumer output depends on them.
        """
        names, signals, nsamples, nvalid = batch
        pad = max(1, int(pad_to_multiple))
        step = max(int(batch_size) - int(batch_size) % pad, pad)
        if signals.shape[0] <= step:
            yield batch
            return
        for lo in range(0, nvalid, step):
            hi = min(lo + step, signals.shape[0])
            chunk_names = names[lo:min(hi, len(names))]
            yield (chunk_names, signals[lo:hi],
                   nsamples[lo:hi], len(chunk_names))

    def stream(self, utterances, batch_size, pad_to_multiple=1,
               njobs=4, depth=2):
        """Yield padded batches, populating or replaying the cache.

        Same contract as :func:`stream_batches`; on replay the
        recorded batches re-chunk to at most ``batch_size`` rows.
        """
        import jax

        utterances = list(utterances)
        key = self._key(utterances, pad_to_multiple)
        cached = self._entries.get(key)
        if cached is not None:
            for batch in cached:
                yield from self._rechunk(
                    batch, batch_size, pad_to_multiple)
            return
        if key in self._oversize:
            yield from stream_batches(
                utterances, batch_size, pad_to_multiple,
                njobs=njobs, depth=depth)
            return

        entries, store = [], True
        # host buffers recycle once their device copy is ready; a
        # small pending window keeps the pool fed without stalling
        # the decode/dispatch overlap on every transfer
        pending = []
        for names, signals, nsamples, nvalid in stream_batches(
                utterances, batch_size, pad_to_multiple,
                njobs=njobs, depth=depth):
            dev = jax.device_put(as_int16_if_lossless(signals))
            batch = (list(names), dev,
                     np.array(nsamples, copy=True), nvalid)
            if store:
                if self._bytes + dev.nbytes > self._max_bytes:
                    store = False
                    for _, old, _, _ in entries:
                        self._bytes -= old.nbytes
                    entries = []
                else:
                    self._bytes += dev.nbytes
                    entries.append(batch)
            pending.append((signals, dev))
            while len(pending) > self._depth:
                buf, done = pending.pop(0)
                jax.block_until_ready(done)
                recycle(buf)
            yield batch
        for buf, done in pending:
            jax.block_until_ready(done)
            recycle(buf)
        if store:
            self._entries[key] = entries
        else:
            self._oversize.add(key)


def stream_batches(utterances, batch_size, pad_to_multiple=1,
                   njobs=4, depth=2):
    """Yield padded batches with bounded look-ahead decoding.

    A generator equivalent of ``make_batches(load_signals(...))`` that
    keeps at most ``depth`` decoded batches in flight: the next
    batches decode on host threads while the consumer computes on the
    current one. ``njobs`` bounds the per-batch decode parallelism of
    the pure-Python loader (the native WAV loader threads internally).
    """
    plans = plan_batches(utterances, batch_size, pad_to_multiple)
    if not plans:
        return
    depth = max(1, int(depth))

    with concurrent.futures.ThreadPoolExecutor(
            max_workers=depth) as pool:
        pending = []
        nextp = 0
        while nextp < len(plans) and len(pending) < depth:
            chunk, rows = plans[nextp]
            pending.append(pool.submit(decode_batch, chunk, rows, njobs))
            nextp += 1
        while pending:
            batch = pending.pop(0).result()
            if nextp < len(plans):
                chunk, rows = plans[nextp]
                pending.append(
                    pool.submit(decode_batch, chunk, rows, njobs))
                nextp += 1
            yield batch
