"""Scaled-down sustained-scale run: the audio plane stays bounded.

The full >= 7 h recorded run is ``examples/sustained_scale.py`` (its
numbers live in ``doc/performance.md``); these slow-marked tests prove
the boundedness property hermetically. Deselected by default
(``-m "not slow"`` in pyproject); run with ``pytest -m slow``.

Process RSS is the wrong observable on the CPU backend: the "device"
buffers and XLA's transient execution arenas live in host memory and
measure ~2 GB regardless of the corpus (they are batch-shaped, not
corpus-shaped), drowning the audio signal. The streaming plan's own
accounting (``stream.pool_peak_bytes``: the most batch-buffer memory
ever alive at once) is the boundedness promise as a number; the
example run measures real RSS on real hardware where device memory is
off-host.
"""

import os
import sys
import warnings

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

from sustained_scale import build_corpus  # noqa: E402


def _drain(utterances, batch_size):
    """Consume the streaming plan the way the executor does: decode
    bounded-look-ahead batches, then hand each buffer back once the
    consumer is done with it (the upload, here a checksum)."""
    from shennong_tpu.parallel import stream

    stream.pool_reset_peak()
    total_rows = 0
    for names, signals, nsamples, nvalid in stream.stream_batches(
            utterances, batch_size, njobs=2, depth=2):
        total_rows += nvalid
        assert signals[0].any()
        stream.recycle(signals)
    assert total_rows == len(list(utterances))
    return stream.pool_peak_bytes()


@pytest.mark.slow
def test_streaming_audio_plane_bounded(tmp_path):
    """Decoding a 2 h corpus through the streaming plan must hold only
    a few padded batches: peak batch-buffer memory is (depth + pool)
    x batch_bytes regardless of corpus size — a decode-everything
    plan would hold the full corpus (230 MB float32 / 115 MB int16
    at this scale)."""
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        utterances, audio_seconds = build_corpus(str(tmp_path), 2.0)
    assert audio_seconds >= 2.0 * 3600

    peak = _drain(utterances, batch_size=8)
    corpus_int16 = audio_seconds * 16000 * 2
    # 8-row batches of <= 30 s utterances are ~8.4 MB int16 each;
    # depth-2 look-ahead plus the recycle pool (up to 4 buffers per
    # shape) holds a handful of them — measured 38 MB, and the same
    # 38 MB at every corpus size (see the companion test), vs the
    # 230 MB a decode-everything plan would hold here
    assert 0 < peak < 0.25 * corpus_int16, (peak, corpus_int16)


@pytest.mark.slow
def test_streaming_peak_corpus_independent(tmp_path):
    """The high-water mark must NOT scale with the corpus: a 4x
    corpus through the same plan peaks within noise of the 1x run
    (buffers recycle; nothing accumulates)."""
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        small_dir = tmp_path / 'small'
        big_dir = tmp_path / 'big'
        small_dir.mkdir()
        big_dir.mkdir()
        small, _ = build_corpus(str(small_dir), 0.25)
        big, _ = build_corpus(str(big_dir), 1.0)

    peak_small = _drain(small, batch_size=8)
    peak_big = _drain(big, batch_size=8)
    # the big run reuses the small run's pooled buffers (identical
    # batch shapes), so its peak may only creep by pool slack
    assert peak_big < 1.5 * peak_small, (peak_small, peak_big)
