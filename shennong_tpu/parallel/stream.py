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

import numpy as np

from shennong_tpu import native
from shennong_tpu.ops.framing import bucket_size


def _scan_count(utt):
    """Utterance sample count from header metadata only (no decode)."""
    from shennong_tpu.audio import Audio
    meta = Audio.scan(utt.audio_file)
    if utt.tstart is None:
        return meta.nsamples
    start = int(utt.tstart * meta.sample_rate)
    return int(utt.tstop * meta.sample_rate) - start


def plan_batches(utterances, batch_size, pad_to_multiple=1):
    """Partition utterances into batch plans without decoding audio.

    Returns a list of (utterance_chunk, rows) with utterances sorted
    by scanned length — same grouping policy as
    :func:`~shennong_tpu.parallel.batch.make_batches`, driven by
    header metadata instead of decoded signals.
    """
    utterances = list(utterances)
    order = sorted(range(len(utterances)),
                   key=lambda i: _scan_count(utterances[i]))
    plans = []
    for start in range(0, len(order), batch_size):
        chunk = [utterances[i] for i in order[start:start + batch_size]]
        rows = len(chunk)
        if rows % pad_to_multiple:
            rows += pad_to_multiple - rows % pad_to_multiple
        plans.append((chunk, rows))
    return plans


def decode_batch(chunk, rows, njobs=4):
    """Decode one batch plan into the padded upload payload.

    The padded signal length is a geometric bucket of the *decoded*
    maximum (scan estimates for compressed formats can be off by a few
    samples; the decoded truth keeps payloads exact).
    """
    from shennong_tpu.parallel import batch as batching

    items = batching.load_signals(chunk, njobs=njobs)

    nvalid = len(items)
    max_len = bucket_size(max(len(sig) for _, sig in items))
    signals = np.zeros((rows, max_len), dtype=np.float32)
    nsamples = np.full(rows, 1, dtype=np.int32)
    names = []
    for row, (name, sig) in enumerate(items):
        signals[row, :len(sig)] = sig
        nsamples[row] = len(sig)
        names.append(name)
    return names, signals, nsamples, nvalid


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
