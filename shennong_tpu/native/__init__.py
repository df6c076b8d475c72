"""ctypes bindings to the native IO runtime (shennong_io.cpp).

The C++ library provides the host-side data plane of the framework: a
threaded batched WAV loader filling the executor's padded device
upload buffers, fast WAV header scans and a bulk Kaldi ark
indexer/reader. The library is compiled on first use (g++, cached next
to the source); every entry point has a pure-Python fallback so the
package works without a toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = [
    os.path.join(_HERE, 'shennong_io.cpp'),
    os.path.join(_HERE, 'shennong_flac.cpp'),
    os.path.join(_HERE, 'shennong_viterbi.cpp'),
    os.path.join(_HERE, 'shennong_csv.cpp')]
_LIBRARY = os.path.join(_HERE, 'libshennong_io.so')

# the compressed-audio codec (mp3/ogg/... via the system libav*
# libraries) builds as its own shared object so a machine without
# libavformat still gets the base IO runtime
_CODEC_SOURCES = [os.path.join(_HERE, 'shennong_codec.cpp')]
_CODEC_LIBRARY = os.path.join(_HERE, 'libshennong_codec.so')

_lock = threading.Lock()
_lib = None
_failed = False
_codec_lib = None
_codec_failed = False


def _build():
    # -march=native: the library builds lazily on the machine that
    # runs it, so host-specific SIMD is safe and the banded Viterbi
    # measures 4x faster (AVX blends vs baseline SSE2).
    # -ffp-contract=off: no silent FMA fusion — the Viterbi and codec
    # kernels carry bit-exactness contracts against their numpy
    # fallbacks. Falls back to the portable flags if the toolchain
    # rejects -march=native.
    flags = ['-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
             '-ffp-contract=off']
    for extra in (['-march=native'], []):
        try:
            subprocess.run(
                ['g++'] + flags + extra + ['-o', _LIBRARY] + _SOURCES,
                check=True, capture_output=True)
            return
        except subprocess.CalledProcessError:
            pass
    # shennong_csv.cpp needs floating-point std::to_chars
    # (libstdc++ >= 11); retry without it so an older toolchain
    # still gets the WAV/ark/FLAC runtime (csv_write then reports
    # unavailable and the serializer falls back to numpy.savetxt)
    subprocess.run(
        ['g++'] + flags + ['-o', _LIBRARY]
        + [s for s in _SOURCES if not s.endswith('shennong_csv.cpp')],
        check=True, capture_output=True)


def _build_codec():
    subprocess.run(
        ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
         '-o', _CODEC_LIBRARY] + _CODEC_SOURCES
        + ['-lavformat', '-lavcodec', '-lavutil', '-lswresample'],
        check=True, capture_output=True)


def load_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.isfile(_LIBRARY)
                    or os.path.getmtime(_LIBRARY)
                    < max(os.path.getmtime(s) for s in _SOURCES)):
                _build()
            lib = ctypes.CDLL(_LIBRARY)

            lib.shennong_wav_scan.restype = ctypes.c_int
            lib.shennong_wav_scan.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]

            lib.shennong_wav_scan2.restype = ctypes.c_int
            lib.shennong_wav_scan2.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]

            lib.shennong_load_wav_batch.restype = ctypes.c_int
            lib.shennong_load_wav_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]

            lib.shennong_load_wav_batch_i16.restype = ctypes.c_int
            lib.shennong_load_wav_batch_i16.argtypes = [
                ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]

            lib.shennong_ark_index.restype = ctypes.c_int64
            lib.shennong_ark_index.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]

            lib.shennong_ark_read.restype = ctypes.c_int
            lib.shennong_ark_read.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]

            lib.shennong_ark_read_f32.restype = ctypes.c_int
            lib.shennong_ark_read_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]

            lib.shennong_flac_scan.restype = ctypes.c_int
            lib.shennong_flac_scan.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]

            lib.shennong_flac_decode.restype = ctypes.c_int64
            lib.shennong_flac_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64]

            lib.shennong_viterbi_banded.restype = ctypes.c_int64
            lib.shennong_viterbi_banded.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]

            lib.shennong_viterbi_banded_two.restype = ctypes.c_int64
            lib.shennong_viterbi_banded_two.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]

            try:
                # absent when the library built without shennong_csv
                # (toolchain lacking floating-point std::to_chars)
                lib.shennong_csv_write.restype = ctypes.c_int64
                lib.shennong_csv_write.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
            except AttributeError:  # pragma: nocover
                pass

            _lib = lib
        except Exception:
            _failed = True
    return _lib


def load_codec_library():
    """Load (building if needed) the codec library, or None.

    Returns None on machines without the libav* system libraries;
    callers then fall back to an ffmpeg binary or raise.
    """
    global _codec_lib, _codec_failed
    if _codec_lib is not None or _codec_failed:
        return _codec_lib
    with _lock:
        if _codec_lib is not None or _codec_failed:
            return _codec_lib
        try:
            if (not os.path.isfile(_CODEC_LIBRARY)
                    or os.path.getmtime(_CODEC_LIBRARY)
                    < max(os.path.getmtime(s) for s in _CODEC_SOURCES)):
                _build_codec()
            lib = ctypes.CDLL(_CODEC_LIBRARY)

            lib.shennong_codec_scan.restype = ctypes.c_int
            lib.shennong_codec_scan.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]

            lib.shennong_codec_decode.restype = ctypes.POINTER(
                ctypes.c_int16)
            lib.shennong_codec_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]

            lib.shennong_codec_free.restype = None
            lib.shennong_codec_free.argtypes = [
                ctypes.POINTER(ctypes.c_int16)]

            lib.shennong_codec_encode.restype = ctypes.c_int
            lib.shennong_codec_encode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]

            _codec_lib = lib
        except Exception:
            _codec_failed = True
    return _codec_lib


def available():
    """True when the native library could be built and loaded"""
    return load_library() is not None


def codec_available():
    """True when the libav*-backed codec library is usable"""
    return load_codec_library() is not None


def codec_scan(path):
    """(channels, sample_rate, nsamples_estimate) of a compressed
    audio file, or None. The sample count comes from the container
    duration (the exact count requires a decode, as with the
    reference's ffmpeg probe)."""
    lib = load_codec_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    nsamples = ctypes.c_int64()
    status = lib.shennong_codec_scan(
        str(path).encode(), ctypes.byref(channels), ctypes.byref(rate),
        ctypes.byref(nsamples))
    if status != 0:
        return None
    return channels.value, rate.value, nsamples.value


def codec_decode(path):
    """Decode a compressed audio file entirely.

    Returns (samples int16 [nframes] or [nframes, channels],
    sample_rate), or None when the codec library is unavailable or
    the file cannot be decoded.
    """
    lib = load_codec_library()
    if lib is None:
        return None
    nframes = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    buffer = lib.shennong_codec_decode(
        str(path).encode(), ctypes.byref(nframes),
        ctypes.byref(channels), ctypes.byref(rate))
    if not buffer:
        return None
    try:
        count = nframes.value * channels.value
        # astype (not copy) so the result carries the canonical
        # np.int16 dtype instance, not ctypeslib's private one
        data = np.ctypeslib.as_array(
            buffer, shape=(count,)).astype(np.int16)
    finally:
        lib.shennong_codec_free(buffer)
    if channels.value > 1:
        data = data.reshape(nframes.value, channels.value)
    return data, rate.value


def codec_encode(path, data, sample_rate):
    """Encode interleaved int16 PCM to ``path`` (format from the
    extension: mp3, flac, ogg, ...). Returns True on success."""
    lib = load_codec_library()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.int16)
    nframes = data.shape[0]
    channels = 1 if data.ndim == 1 else data.shape[1]
    status = lib.shennong_codec_encode(
        str(path).encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        nframes, channels, sample_rate)
    return status == 0


def wav_scan(path):
    """(channels, sample_rate, nsamples) of a WAV file, or None."""
    lib = load_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    nsamples = ctypes.c_int64()
    status = lib.shennong_wav_scan(
        str(path).encode(), ctypes.byref(channels), ctypes.byref(rate),
        ctypes.byref(nsamples))
    if status != 0:
        return None
    return channels.value, rate.value, nsamples.value


def wav_scan2(path):
    """(channels, sample_rate, nsamples, format, bits) or None.

    Like :func:`wav_scan` with the WAV format tag (1 = PCM, 3 = IEEE
    float) and the bit depth, so callers can pick the int16 fast
    loading path for PCM16 files.
    """
    lib = load_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    nsamples = ctypes.c_int64()
    fmt = ctypes.c_int32()
    bits = ctypes.c_int32()
    status = lib.shennong_wav_scan2(
        str(path).encode(), ctypes.byref(channels), ctypes.byref(rate),
        ctypes.byref(nsamples), ctypes.byref(fmt), ctypes.byref(bits))
    if status != 0:
        return None
    return channels.value, rate.value, nsamples.value, \
        fmt.value, bits.value


def load_wav_batch_i16(paths, start_samples, max_counts, row_stride,
                       out=None, num_threads=8):
    """Load mono PCM16 WAV segments concurrently into an int16 batch.

    Writes straight into ``out`` ([len(paths), row_stride] int16,
    allocated when not given) so callers can reuse upload buffers —
    fresh page faults dominate bulk loads on slow-memory hosts, and
    the int16 rows later upload at half the float32 bytes. Returns
    (out, counts [len(paths)] int64) or None when the library is
    unavailable or any file is not plain mono PCM16 (callers then
    fall back to the float32 loader).
    """
    lib = load_library()
    if lib is None:
        return None

    batch = len(paths)
    packed = b''.join(str(p).encode() + b'\0' for p in paths)
    starts = np.asarray(start_samples, dtype=np.int64)
    counts = np.asarray(max_counts, dtype=np.int64)
    if out is None:
        out = np.empty((batch, row_stride), dtype=np.int16)
    assert (out.shape == (batch, row_stride)
            and out.dtype == np.int16 and out.flags['C_CONTIGUOUS'])
    out_counts = np.empty(batch, dtype=np.int64)

    failures = lib.shennong_load_wav_batch_i16(
        packed, batch,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        row_stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads)
    if failures:
        return None
    return out, out_counts


def load_wav_batch(paths, start_samples, max_counts, row_stride,
                   num_threads=8):
    """Load mono WAV segments concurrently into a padded batch.

    Returns (batch [len(paths), row_stride] float32 in int16 range,
    counts [len(paths)] int64) or None if the native library is
    unavailable or any file failed (callers then fall back to the
    Python loader).
    """
    lib = load_library()
    if lib is None:
        return None

    batch = len(paths)
    packed = b''.join(str(p).encode() + b'\0' for p in paths)
    starts = np.asarray(start_samples, dtype=np.int64)
    counts = np.asarray(max_counts, dtype=np.int64)
    out = np.empty((batch, row_stride), dtype=np.float32)
    out_counts = np.empty(batch, dtype=np.int64)

    failures = lib.shennong_load_wav_batch(
        packed, batch,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        row_stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads)
    if failures:
        return None
    return out, out_counts


def ark_index(path, max_records=1 << 20, keys_capacity=1 << 24):
    """Index a binary ark: list of (key, offset, rows, cols,
    is_double), or None."""
    lib = load_library()
    if lib is None:
        return None
    keys_buf = ctypes.create_string_buffer(keys_capacity)
    meta = np.empty((max_records, 4), dtype=np.int64)
    count = lib.shennong_ark_index(
        str(path).encode(), keys_buf, keys_capacity,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_records)
    if count < 0:
        return None
    # bound the split at `count` NULs: splitting the whole capacity
    # buffer would shred megabytes of trailing zeros
    keys = keys_buf.raw.split(b'\0', count)[:count]
    return [
        (keys[i].decode(), int(meta[i, 0]), int(meta[i, 1]),
         int(meta[i, 2]), bool(meta[i, 3]))
        for i in range(count)]


def flac_scan(path):
    """(channels, sample_rate, bits, nsamples) of a FLAC file, or
    None when the native library is unavailable or parsing failed."""
    lib = load_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    nsamples = ctypes.c_int64()
    status = lib.shennong_flac_scan(
        str(path).encode(), ctypes.byref(channels), ctypes.byref(rate),
        ctypes.byref(bits), ctypes.byref(nsamples))
    if status != 0:
        return None
    return channels.value, rate.value, bits.value, nsamples.value


def flac_decode(path):
    """Decode a FLAC file.

    Returns (samples [nframes, channels] or [nframes] int16/int32,
    sample_rate), or None when the native library is unavailable or
    decoding failed.
    """
    lib = load_library()
    if lib is None:
        return None
    meta = flac_scan(path)
    if meta is None:
        return None
    channels, rate, bits, nsamples = meta
    if nsamples <= 0:
        # total unknown in STREAMINFO: bound by the file size (a FLAC
        # frame never expands past ~1 sample per coded bit)
        nsamples = os.path.getsize(path) * 8 // max(bits, 1) + 65536
    out = np.empty(nsamples * channels, dtype=np.int32)
    decoded = lib.shennong_flac_decode(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.shape[0])
    if decoded < 0:
        return None
    data = out[:decoded * channels].reshape(decoded, channels)
    if channels == 1:
        data = data[:, 0]
    if bits <= 16:
        data = data.astype(np.int16)
    return data, rate


def csv_write(path, header, values, num_threads=8):
    """Write a 2-D float64 array as a space-separated CSV.

    ``header`` is written verbatim first (pass '' for none). Values
    are formatted %.17g (round-trip exact). Returns True on success,
    False when the native library is unavailable or the write failed
    (callers then fall back to numpy.savetxt).
    """
    lib = load_library()
    if lib is None or not hasattr(lib, 'shennong_csv_write'):
        return False
    values = np.ascontiguousarray(values, dtype=np.float64)
    if values.ndim != 2:
        return False
    written = lib.shennong_csv_write(
        str(path).encode(), header.encode(),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        values.shape[0], values.shape[1], num_threads)
    return written >= 0


def ark_read_matrix(path, offset, rows, cols, is_double,
                    as_float32=False):
    """Bulk-read one ark matrix record, or None.

    ``as_float32`` converts a double record to float32 during the
    read (single pass over the destination pages, instead of read +
    astype).
    """
    lib = load_library()
    if lib is None:
        return None
    if is_double and as_float32:
        out = np.empty((rows, cols), dtype=np.float32)
        status = lib.shennong_ark_read_f32(
            str(path).encode(), offset, rows * cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out if status == 0 else None
    dtype = np.float64 if is_double else np.float32
    out = np.empty((rows, cols), dtype=dtype)
    status = lib.shennong_ark_read(
        str(path).encode(), offset, out.nbytes,
        out.ctypes.data_as(ctypes.c_void_p))
    return out if status == 0 else None


def viterbi_banded(log_start, band, log_obs):
    """Banded Viterbi decode, or None when the library is unavailable.

    ``band[j, d]`` holds the transition weight from state
    ``j - halfwidth + d`` to state ``j`` (-inf outside the band and
    the state range); halfwidth is inferred from the band width.
    Bit-identical to the numpy decoder in ops/viterbi.py.
    """
    lib = load_library()
    if lib is None:
        return None
    log_start = np.ascontiguousarray(log_start, dtype=np.float64)
    band = np.ascontiguousarray(band, dtype=np.float64)
    log_obs = np.ascontiguousarray(log_obs, dtype=np.float64)
    nframes, nstates = log_obs.shape
    path = np.empty(nframes, dtype=np.int64)
    status = lib.shennong_viterbi_banded(
        log_start.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        log_obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nframes, nstates, band.shape[1],
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return path if status == 0 else None


def viterbi_banded_two(log_start, band, uniform_weight, self_weight,
                       observations, nstates):
    """Banded Viterbi decode with a two-valued observation model.

    State j at frame t weighs ``self_weight`` when
    ``j == observations[t]`` and ``uniform_weight`` otherwise (the
    CREPE smoothing prior), avoiding the dense [T, S] observation
    matrix. Returns the path, or None when the library is
    unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    log_start = np.ascontiguousarray(log_start, dtype=np.float64)
    band = np.ascontiguousarray(band, dtype=np.float64)
    observations = np.ascontiguousarray(observations, dtype=np.int32)
    path = np.empty(observations.shape[0], dtype=np.int64)
    status = lib.shennong_viterbi_banded_two(
        log_start.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(uniform_weight), float(self_weight),
        observations.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        observations.shape[0], nstates, band.shape[1],
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return path if status == 0 else None
