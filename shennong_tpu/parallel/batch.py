"""Length bucketing and padded batch assembly (host data plane).

WAV decoding goes through the native C++ threaded loader
(:mod:`shennong_tpu.native`) when available — one call decodes a whole
utterance batch concurrently straight into the padded upload buffer —
with a pure-Python fallback for other formats or missing toolchains.
"""

import concurrent.futures

import numpy as np

from shennong_tpu import native
from shennong_tpu.ops.framing import bucket_size


def _utterance_bounds(utt, sample_rate):
    """(first_sample, sample_count) of an utterance in its file."""
    if utt.tstart is None:
        return 0, None
    start = int(utt.tstart * sample_rate)
    stop = int(utt.tstop * sample_rate)
    return start, stop - start


def _load_signals_native(utterances):
    """Decode all utterances with the C++ batch loader, or None."""
    paths, starts, counts = [], [], []
    for utt in utterances:
        scan = native.wav_scan(utt.audio_file)
        if scan is None or scan[0] != 1:
            return None
        channels, rate, nsamples = scan
        start, count = _utterance_bounds(utt, rate)
        if count is None:
            count = nsamples - start
        paths.append(utt.audio_file)
        starts.append(start)
        counts.append(count)

    stride = max(counts)
    loaded = native.load_wav_batch(paths, starts, counts, stride)
    if loaded is None:
        return None
    batch, out_counts = loaded
    return [
        (utt.name, batch[i, :out_counts[i]])
        for i, utt in enumerate(utterances)]


def load_signals(utterances, njobs=4):
    """Load all utterance audio (native threaded loader, Python
    fallback).

    Returns a list of (name, float32 samples in int16 range) in
    utterance order.
    """
    utterances = list(utterances)
    if native.available():
        items = _load_signals_native(utterances)
        if items is not None:
            return items

    def load_one(utt):
        audio = utt.load_audio()
        if audio.nchannels != 1:
            # the native loader rejects multichannel files the same
            # way; without this the 2-D samples crash batch assembly
            # with an opaque broadcast error
            raise ValueError(
                'audio signal must have one channel, but it has {}'
                .format(audio.nchannels))
        return utt.name, audio.astype(np.int16).data.astype(np.float32)

    with concurrent.futures.ThreadPoolExecutor(
            max_workers=max(1, njobs)) as pool:
        return list(pool.map(load_one, utterances))


def make_batches(items, batch_size, pad_to_multiple=1):
    """Group (name, signal) pairs into padded batches.

    Items are sorted by length so each batch wastes little padding;
    batch signal length is rounded to a geometric bucket (bounding jit
    recompilations) and the batch is padded with silent rows up to
    ``pad_to_multiple`` (for even sharding over devices).

    Yields (names, signals [B, T], nsamples [B], nvalid) with
    ``nvalid`` the number of real (non padding) rows.
    """
    order = sorted(range(len(items)), key=lambda i: len(items[i][1]))

    for start in range(0, len(order), batch_size):
        chunk = [items[i] for i in order[start:start + batch_size]]
        nvalid = len(chunk)
        rows = nvalid
        if rows % pad_to_multiple:
            rows += pad_to_multiple - rows % pad_to_multiple

        max_len = bucket_size(max(len(sig) for _, sig in chunk))
        signals = np.zeros((rows, max_len), dtype=np.float32)
        nsamples = np.full(rows, 1, dtype=np.int32)
        names = []
        for row, (name, sig) in enumerate(chunk):
            signals[row, :len(sig)] = sig
            nsamples[row] = len(sig)
            names.append(name)

        yield names, signals, nsamples, nvalid
