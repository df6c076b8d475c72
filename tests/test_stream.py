"""Streaming host data plane (shennong_tpu.parallel.stream).

Checks that the bounded-prefetch generator produces exactly the same
padded payloads as an eager decode of the whole corpus, that its
look-ahead really is bounded (at most ``depth`` decoded batches in
flight), and that the executor built on it still matches the
per-utterance processor outputs.
"""

import threading

import numpy as np
import pytest
import scipy.io.wavfile

from shennong_tpu.parallel import batch as batching
from shennong_tpu.parallel import stream as streaming
from shennong_tpu.utterances import Utterances


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """12 wav files of staggered lengths + the utterance index."""
    path = tmp_path_factory.mktemp('stream_corpus')
    rng = np.random.RandomState(7)
    entries = []
    for i in range(12):
        nsamples = 4000 + 1713 * i
        sig = (rng.randn(nsamples) * 2000).astype(np.int16)
        wav = path / f'u{i:02d}.wav'
        scipy.io.wavfile.write(str(wav), 16000, sig)
        entries.append((f'u{i:02d}', str(wav), f'spk{i % 3}'))
    return Utterances(entries)


def _eager_batches(utterances, batch_size, pad_to_multiple=1):
    items = batching.load_signals(list(utterances))
    return list(batching.make_batches(items, batch_size, pad_to_multiple))


def test_stream_equals_eager(corpus):
    eager = _eager_batches(corpus, batch_size=5)
    streamed = list(streaming.stream_batches(corpus, batch_size=5))

    assert len(eager) == len(streamed)
    for (en, es, ec, ev), (sn, ss, sc, sv) in zip(eager, streamed):
        assert en == sn
        assert ev == sv
        np.testing.assert_array_equal(ec, sc)
        np.testing.assert_array_equal(es, ss)


def test_stream_pad_to_multiple(corpus):
    for names, signals, nsamples, nvalid in streaming.stream_batches(
            corpus, batch_size=5, pad_to_multiple=4):
        assert signals.shape[0] % 4 == 0
        assert nvalid == len(names)
        assert signals.shape[0] >= nvalid
        # padding rows are silent and one sample long
        for row in range(nvalid, signals.shape[0]):
            assert nsamples[row] == 1
            assert not signals[row].any()


def test_stream_bounded_lookahead(corpus, monkeypatch):
    """Never more than ``depth`` decodes in flight ahead of the
    consumer: with the consumer stalled, at most depth batches decode."""
    lock = threading.Lock()
    state = {'running': 0, 'done': 0, 'max_done_ahead': 0}
    consumed = {'count': 0}
    real_decode = streaming.decode_batch

    def tracking_decode(chunk, rows, njobs=4):
        with lock:
            state['running'] += 1
        out = real_decode(chunk, rows, njobs)
        with lock:
            state['running'] -= 1
            state['done'] += 1
            ahead = state['done'] - consumed['count']
            state['max_done_ahead'] = max(state['max_done_ahead'], ahead)
        return out

    monkeypatch.setattr(streaming, 'decode_batch', tracking_decode)

    gen = streaming.stream_batches(corpus, batch_size=2, depth=2)
    batches = 0
    for _ in gen:
        # stall so the prefetcher runs as far ahead as it ever will
        import time
        time.sleep(0.05)
        consumed['count'] += 1
        batches += 1
    assert batches == 6
    # depth in-flight jobs + the one being handed over
    assert state['max_done_ahead'] <= 3


def test_plan_matches_scan_lengths(corpus):
    plans = streaming.plan_batches(corpus, batch_size=5)
    seen = [u.name for chunk, _ in plans for u in chunk]
    assert sorted(seen) == sorted(u.name for u in corpus)
    # within the plan order, scanned lengths are non-decreasing
    lengths = [
        streaming._scan_count(u) for chunk, _ in plans for u in chunk]
    assert lengths == sorted(lengths)


def test_executor_streaming_matches_single(corpus):
    from shennong_tpu.parallel.executor import BatchExecutor
    from shennong_tpu.processor.mfcc import MfccProcessor

    proc = MfccProcessor(dither=0)
    batched = BatchExecutor(proc, batch_size=5).process_all(corpus)
    for utt in corpus:
        single = MfccProcessor(dither=0).process(utt.load_audio())
        np.testing.assert_allclose(
            batched[utt.name].data, single.data, atol=2e-4, rtol=1e-5)


def test_stream_segment_utterances(corpus, tmp_path):
    """tstart/tstop segments decode to the same payloads streaming
    and eager."""
    first = list(corpus)[3]
    utts = Utterances([
        ('seg1', first.audio_file, 0.0, 0.25),
        ('seg2', first.audio_file, 0.1, 0.5)])
    eager = _eager_batches(utts, batch_size=4)
    streamed = list(streaming.stream_batches(utts, batch_size=4))
    for (en, es, ec, ev), (sn, ss, sc, sv) in zip(eager, streamed):
        assert en == sn
        np.testing.assert_array_equal(es, ss)
        np.testing.assert_array_equal(ec, sc)


def test_native_i16_path_matches_float_fallback(corpus, monkeypatch):
    """PCM16 corpora decode through the int16 fast path; forcing the
    float fallback must give value-identical payloads."""
    fast = list(streaming.stream_batches(corpus, batch_size=4))
    assert any(s.dtype == np.int16 for _, s, _, _ in fast), \
        'expected the native int16 path on a PCM16 WAV corpus'

    monkeypatch.setattr(streaming, '_native_plan', lambda chunk: None)
    slow = list(streaming.stream_batches(corpus, batch_size=4))
    for (fn, fs, fc, fv), (sn, ss, sc, sv) in zip(fast, slow):
        assert fn == sn and fv == sv
        assert ss.dtype == np.float32
        np.testing.assert_array_equal(fs, ss)
        np.testing.assert_array_equal(fc, sc)


def test_buffer_pool_reuses_and_rejects_views():
    pool = streaming._BufferPool(max_per_key=2)
    buf = pool.take((3, 5), np.int16)
    buf[:] = 7
    pool.give(buf)
    again = pool.take((3, 5), np.int16)
    assert again is buf  # recycled, pages already touched
    other = pool.take((3, 5), np.float32)
    assert other is not buf and other.dtype == np.float32
    # views are never pooled (their memory belongs to another array)
    pool.give(buf[:2])
    fresh = pool.take((2, 5), np.int16)
    assert fresh.base is None


def test_recycled_buffers_are_zero_padded(corpus):
    """A dirty recycled buffer must not leak samples into the padding
    region of the next batch that reuses it."""
    plans = streaming.plan_batches(corpus, batch_size=4)
    chunk, rows = plans[0]
    names, signals, nsamples, nvalid = streaming.decode_batch(
        chunk, rows + 2)
    poisoned = signals
    poisoned[:] = 123  # worst case: recycled buffer full of garbage
    streaming.recycle(poisoned)
    names2, signals2, nsamples2, nvalid2 = streaming.decode_batch(
        chunk, rows + 2)
    assert signals2 is poisoned  # the pool handed the buffer back
    for row in range(nvalid2):
        assert not signals2[row, nsamples2[row]:].any()
    assert not signals2[nvalid2:].any()


def test_buffer_pool_evicts_stale_shapes():
    """A long-lived service over many corpus geometries must not
    hoard buffers for shapes it never sees again."""
    pool = streaming._BufferPool(max_per_key=2, max_keys=4)
    for i in range(10):
        pool.give(np.empty((2, 100 + i), np.int16))
    assert len(pool._free) <= 4
    # the most recently given shape survived
    kept = pool.take((2, 109), np.int16)
    assert kept.shape == (2, 109)
