"""Scaled-down sustained-scale run: streaming RSS stays bounded.

The full >= 7 h recorded run is ``examples/sustained_scale.py`` (its
numbers live in ``doc/performance.md``); this slow-marked test proves
the same boundedness property hermetically on the CPU backend with a
-- still corpus-sized -- fraction of the audio. Deselected by default
(``-m "not slow"`` in pyproject); run with ``pytest -m slow``.
"""

import gc
import os
import sys
import time
import warnings

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

from sustained_scale import RssSampler, build_corpus, rss_mb  # noqa: E402


@pytest.mark.slow
def test_streaming_rss_bounded(tmp_path):
    """Steady-state extraction must not grow RSS by anything near the
    decoded corpus size: the streaming plan holds at most (depth + 1)
    padded batches of audio, so a warm process re-extracting a corpus
    adds only that working set plus the returned features.

    The first extraction is the warmup that materializes everything
    RSS-heavy but corpus-independent — XLA compile arenas, CPU-backend
    device allocations, buffer pools; the assertion is on the SECOND
    run's growth (a decode-everything plan would still pay the full
    decoded corpus there).
    """
    from shennong_tpu import pipeline

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        utterances, audio_seconds = build_corpus(str(tmp_path), 0.25)
        assert audio_seconds >= 0.25 * 3600

        config = pipeline.get_default_config(
            'mfcc', with_pitch='kaldi', with_cmvn=True,
            with_delta=True)
        njobs = os.cpu_count() or 1

        # run 1: compiles every bucket program, fills the buffer pools
        features = pipeline.extract_features(
            config, utterances, njobs=njobs)
        assert len(features) == len(utterances)
        del features
        gc.collect()

        baseline = rss_mb()
        with RssSampler(interval=0.1) as sampler:
            start = time.perf_counter()
            features = pipeline.extract_features(
                config, utterances, njobs=njobs)
            extract_s = time.perf_counter() - start

    assert len(features) == len(utterances)
    corpus_float32_mb = audio_seconds * 16000 * 4 / 2 ** 20
    delta_mb = sampler.peak - baseline
    # the decoded corpus would be ~55 MB float32; the warm streamed
    # run's added working set (bounded decode-ahead + the returned
    # features, ~7 MB here) must stay well under it
    assert delta_mb < 0.8 * corpus_float32_mb, (
        delta_mb, corpus_float32_mb)
    # sanity: the run actually sustained corpus-scale throughput
    assert audio_seconds / extract_s > 1
