"""Device-signal cache: one corpus upload spanning many sweeps.

Covers :class:`shennong_tpu.parallel.stream.SignalCache` (transparent
replay of uploaded batches), its consumers (BatchExecutor, the UBM
front-end) and the UBM->VTLN front-end reuse.
"""

import numpy as np
import pytest

from shennong_tpu.audio import Audio
from shennong_tpu.parallel import stream as streaming
from shennong_tpu.parallel.stream import SignalCache
from shennong_tpu.utterances import Utterances

from .conftest import make_speech_like_signal


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """Five wav files of different lengths, two speakers."""
    path = tmp_path_factory.mktemp('cache_corpus')
    items = []
    for i, nsamples in enumerate(
            [8000, 12000, 16000, 17000, 24000]):
        signal = make_speech_like_signal(nsamples, 16000, seed=i)
        wav = str(path / f'utt{i}.wav')
        Audio(signal, 16000).save(wav)
        items.append(
            (f'utt{i}', wav, 'spk1' if i % 2 else 'spk2'))
    return Utterances(items)


def _collect(source):
    """name -> (valid signal row as float, nsamples) for a stream."""
    rows = {}
    for names, signals, nsamples, nvalid in source:
        host = np.asarray(signals)
        for row, name in enumerate(names):
            count = int(nsamples[row])
            rows[name] = host[row, :count].astype(np.float32)
    return rows


def test_replay_matches_stream(corpus):
    cache = SignalCache()
    fresh = _collect(streaming.stream_batches(corpus, batch_size=2))
    first = _collect(cache.stream(corpus, batch_size=2))
    replay = _collect(cache.stream(corpus, batch_size=2))
    assert set(fresh) == set(first) == set(replay)
    for name in fresh:
        np.testing.assert_array_equal(fresh[name], first[name])
        np.testing.assert_array_equal(fresh[name], replay[name])


def test_populate_yields_device_arrays(corpus):
    cache = SignalCache()
    for _, signals, _, _ in cache.stream(corpus, batch_size=2):
        # device arrays, uploaded as int16 (PCM16 corpus)
        assert not isinstance(signals, np.ndarray)
        assert signals.dtype == np.int16
    # replay does not decode at all
    def boom(*args, **kwargs):  # pragma: nocover
        raise AssertionError('replay must not decode')
    orig = streaming.decode_batch
    streaming.decode_batch = boom
    try:
        replayed = list(cache.stream(corpus, batch_size=2))
    finally:
        streaming.decode_batch = orig
    assert len(replayed) == 3


def test_replay_rechunks_to_consumer_batch_size(corpus):
    """A recorded 5-row batch replays as consumer-sized chunks with
    identical rows (the warp-moment pass sizes its batches to the
    fused program's memory footprint)."""
    cache = SignalCache()
    recorded = list(cache.stream(corpus, batch_size=5))
    assert len(recorded) == 1
    replayed = list(cache.stream(corpus, batch_size=2))
    assert [len(names) for names, *_ in replayed] == [2, 2, 1]
    fresh = _collect(streaming.stream_batches(corpus, batch_size=5))
    chunks = _collect(iter(replayed))
    assert set(chunks) == set(fresh)
    for name in fresh:
        np.testing.assert_array_equal(fresh[name], chunks[name])


def test_budget_is_global_across_entries(corpus):
    """max_bytes caps TOTAL retention: a second utterance set that
    would exceed the remaining budget streams instead of retaining."""
    probe = SignalCache()
    list(probe.stream(corpus, batch_size=2))
    one_copy = probe._bytes
    assert one_copy > 0

    cache = SignalCache(max_bytes=one_copy)
    list(cache.stream(corpus, batch_size=2))
    assert cache._bytes == one_copy
    # same audio under a different padding -> a distinct key that no
    # longer fits the remaining (zero) budget
    list(cache.stream(corpus, batch_size=2, pad_to_multiple=2))
    assert cache._bytes == one_copy
    assert len(cache._oversize) == 1
    assert len(cache._entries) == 1


def test_oversize_falls_back_to_streaming(corpus):
    cache = SignalCache(max_bytes=128)
    first = _collect(cache.stream(corpus, batch_size=2))
    assert cache._entries == {}
    assert len(cache._oversize) == 1
    second = list(cache.stream(corpus, batch_size=2))
    # the fallback is the plain host streaming path
    assert all(
        isinstance(signals, np.ndarray)
        for _, signals, _, _ in second)
    assert set(_collect(iter(second))) == set(first)


def test_executor_replay_equality(corpus):
    from shennong_tpu.processor.mfcc import MfccProcessor
    from shennong_tpu.parallel.executor import BatchExecutor

    proc = MfccProcessor(dither=0)
    plain = BatchExecutor(proc).process_all(corpus, njobs=1)
    cache = SignalCache()
    populated = BatchExecutor(proc).process_all(
        corpus, njobs=1, signal_cache=cache)
    replayed = BatchExecutor(proc).process_all(
        corpus, njobs=1, signal_cache=cache)
    for name in plain.keys():
        np.testing.assert_array_equal(
            plain[name].data, populated[name].data)
        np.testing.assert_array_equal(
            plain[name].data, replayed[name].data)


def _no_dither_features():
    from shennong_tpu import pipeline
    from shennong_tpu.postprocessor.cmvn import (
        SlidingWindowCmvnPostProcessor)

    config = pipeline.get_default_config('mfcc', with_delta=True)
    config['mfcc']['dither'] = 0
    config['sliding_window_cmvn'] = (
        SlidingWindowCmvnPostProcessor().get_params())
    config['sliding_window_cmvn']['cmn_window'] = 300
    config['delta']['window'] = 3
    return config


def test_frontend_cache_transparent(corpus):
    """stream_frontend through a populated cache returns bit-identical
    features (dither=0)."""
    from shennong_tpu.processor.ubm import (
        DiagUbmProcessor, stream_frontend)

    config = _no_dither_features()
    vad = DiagUbmProcessor(4).vad
    plain = stream_frontend(config, vad, 5, corpus, batch_size=2)
    cache = SignalCache()
    via_cache = stream_frontend(
        config, vad, 5, corpus, batch_size=2, signal_cache=cache)
    replay = stream_frontend(
        config, vad, 5, corpus, batch_size=2, signal_cache=cache)
    assert plain is not None and via_cache is not None
    np.testing.assert_array_equal(
        np.asarray(plain[0]), np.asarray(via_cache[0]))
    np.testing.assert_array_equal(
        np.asarray(plain[0]), np.asarray(replay[0]))
    np.testing.assert_array_equal(
        np.asarray(plain[2]), np.asarray(replay[2]))


def test_vtln_reuses_ubm_frontend(corpus, monkeypatch):
    """With identical feature configs the VTLN trainer reuses the
    UBM's front-end pass: stream_frontend runs exactly once and the
    audio decodes exactly once."""
    from shennong_tpu.processor import ubm as ubm_module
    from shennong_tpu.processor.vtln import VtlnProcessor

    config = _no_dither_features()
    calls = []
    real_frontend = ubm_module.stream_frontend

    def counting_frontend(*args, **kwargs):
        calls.append(kwargs.get('signal_cache'))
        return real_frontend(*args, **kwargs)

    monkeypatch.setattr(
        ubm_module, 'stream_frontend', counting_frontend)

    decodes = []
    real_decode = streaming.decode_batch

    def counting_decode(chunk, rows, njobs=4):
        decodes.append(len(chunk))
        return real_decode(chunk, rows, njobs)

    monkeypatch.setattr(streaming, 'decode_batch', counting_decode)

    vtln = VtlnProcessor(
        num_iters=2, min_warp=0.95, max_warp=1.05, warp_step=0.05,
        subsample=5, features=config,
        ubm={'num_gauss': 4, 'num_iters': 1, 'num_iters_init': 2,
             'num_frames': 1000, 'features': config})
    warps = vtln.process(corpus)
    assert sorted(warps.keys()) == [u.name for u in sorted(
        corpus, key=lambda u: u.name)]
    # one front-end pass (the UBM's), reused by the VTLN trainer
    assert len(calls) == 1
    assert calls[0] is not None  # it rode the signal cache
    # the corpus decoded exactly once: the warp-moment pass replayed
    # the cached uploads
    assert sum(decodes) == len(list(corpus))


def test_vtln_mismatched_config_recomputes(corpus, monkeypatch):
    """A VTLN subsample differing from the UBM's must NOT reuse the
    UBM front-end."""
    from shennong_tpu.processor import ubm as ubm_module
    from shennong_tpu.processor.vtln import VtlnProcessor

    config = _no_dither_features()
    calls = []
    real_frontend = ubm_module.stream_frontend

    def counting_frontend(*args, **kwargs):
        calls.append(args)
        return real_frontend(*args, **kwargs)

    monkeypatch.setattr(
        ubm_module, 'stream_frontend', counting_frontend)

    vtln = VtlnProcessor(
        num_iters=1, min_warp=0.95, max_warp=1.05, warp_step=0.05,
        subsample=2, features=config,
        ubm={'num_gauss': 4, 'num_iters': 1, 'num_iters_init': 2,
             'num_frames': 1000, 'subsample': 5, 'features': config})
    warps = vtln.process(corpus)
    assert len(warps) == len(list(corpus))
    assert len(calls) == 2


def test_vtln_decodes_once_with_default_mesh(corpus, monkeypatch):
    """The decode-once guarantee holds in the mesh-enabled path too.

    With a default mesh set, the warp-moment pass streams through a
    BatchExecutor that pads batches to the device count; the UBM/VTLN
    front-ends must use the same pad multiple or the SignalCache
    (which keys on it) silently re-decodes and re-uploads the corpus
    for that pass."""
    import jax

    from shennong_tpu.parallel import data_mesh, set_default_mesh
    from shennong_tpu.processor.vtln import VtlnProcessor

    decodes = []
    real_decode = streaming.decode_batch

    def counting_decode(chunk, rows, njobs=4):
        decodes.append(len(chunk))
        return real_decode(chunk, rows, njobs)

    monkeypatch.setattr(streaming, 'decode_batch', counting_decode)

    config = _no_dither_features()
    vtln = VtlnProcessor(
        num_iters=2, min_warp=0.95, max_warp=1.05, warp_step=0.05,
        subsample=5, features=config,
        ubm={'num_gauss': 4, 'num_iters': 1, 'num_iters_init': 2,
             'num_frames': 1000, 'features': config})
    set_default_mesh(data_mesh(jax.devices()))
    try:
        warps = vtln.process(corpus)
    finally:
        set_default_mesh(None)
    assert sorted(warps.keys()) == [u.name for u in sorted(
        corpus, key=lambda u: u.name)]
    assert sum(decodes) == len(list(corpus))
