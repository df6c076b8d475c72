"""Length bucketing and padded batch assembly."""

import concurrent.futures

import numpy as np

from shennong_tpu.ops.framing import bucket_size


def load_signals(utterances, njobs=4):
    """Load all utterance audio concurrently (host IO).

    Returns a list of (name, float32 samples in int16 range) in
    utterance order. Audio IO is the only part of the pipeline that
    benefits from host threads; everything downstream is device work.
    """
    def load_one(utt):
        audio = utt.load_audio().astype(np.int16)
        return utt.name, audio.data.astype(np.float32)

    # Audio.load caches by file; process sequentially per file order
    # (utterances are already sorted by audio file) but overlap IO
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
