"""Shared pytest fixtures for the shennong_tpu test suite.

Tests run on a virtual 8-device CPU mesh (the JAX-native analog of
multi-node tests without a cluster): the environment is forced to CPU
*before* jax is imported so that sharding tests exercise real
multi-device code paths while staying hermetic and fast.
"""

import os

# must happen before the CPU backend is initialized
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

# the environment may have pre-registered a TPU platform plugin at
# interpreter startup (sitecustomize); force the selection back to CPU
# before any computation so tests stay hermetic and fast
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest
import scipy.io.wavfile

from shennong_tpu.audio import Audio


def make_speech_like_signal(nsamples, sample_rate, seed=0):
    """Deterministic speech-like waveform: voiced harmonics with a
    wandering F0, formant-shaped noise bursts and silences."""
    rng = np.random.RandomState(seed)
    t = np.arange(nsamples) / sample_rate

    # slowly wandering fundamental around 120 Hz
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate
    voiced = sum(
        (0.6 ** k) * np.sin((k + 1) * phase) for k in range(8))

    # amplitude envelope creating syllable-like bursts and silences
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t - 0.5))
    envelope = envelope ** 2
    envelope[: int(0.05 * sample_rate)] = 0  # leading silence

    noise = rng.randn(nsamples) * 0.02
    # keep the leading silence nearly digital-silent so energy-based
    # VAD has genuinely unvoiced frames to find
    noise[: int(0.1 * sample_rate)] *= 1e-2
    signal = voiced * envelope * 0.4 + noise
    signal = signal / np.max(np.abs(signal)) * 0.7
    return (signal * 2 ** 15 * 0.8).astype(np.int16)


@pytest.fixture(scope='session')
def data_path(tmp_path_factory):
    """Directory with generated test data files."""
    path = tmp_path_factory.mktemp('data')

    # the main 16 kHz mono test file: 22713 samples like the reference
    # anchor (gives exactly 140 frames with Kaldi framing defaults)
    signal = make_speech_like_signal(22713, 16000)
    scipy.io.wavfile.write(str(path / 'test.wav'), 16000, signal)

    # 8 kHz variant
    signal8k = make_speech_like_signal(11000, 8000, seed=1)
    scipy.io.wavfile.write(str(path / 'test.8k.wav'), 8000, signal8k)

    # float32 variant
    signal32 = signal.astype(np.float32) / 2 ** 15
    scipy.io.wavfile.write(str(path / 'test.float32.wav'), 16000, signal32)

    # stereo variant
    stereo = np.stack([signal, signal8k[:100].repeat(228)[:22713]], axis=1)
    scipy.io.wavfile.write(str(path / 'test.stereo.wav'), 16000, stereo)

    # a small synthetic alignment covering [0, 1.4] seconds
    tokens = ['a', 'b', 'c', 'a', 'd', 'b', 'a', 'e']
    bounds = np.linspace(0.0, 1.4, len(tokens) + 1)
    with open(path / 'alignment.txt', 'wt') as fp:
        for item in ('item1', 'item2'):
            for i, token in enumerate(tokens):
                fp.write(
                    f'{item} {bounds[i]:.4f} {bounds[i + 1]:.4f} {token}\n')

    return path


@pytest.fixture(scope='session')
def wav_file(data_path):
    return str(data_path / 'test.wav')


@pytest.fixture(scope='session')
def wav_file_8k(data_path):
    return str(data_path / 'test.8k.wav')


@pytest.fixture(scope='session')
def wav_file_float32(data_path):
    return str(data_path / 'test.float32.wav')


@pytest.fixture(scope='session')
def audio(wav_file):
    return Audio.load(wav_file)


@pytest.fixture(scope='session')
def audio_8k(wav_file_8k):
    return Audio.load(wav_file_8k)


@pytest.fixture(scope='session')
def alignment_file(data_path):
    return str(data_path / 'alignment.txt')


@pytest.fixture(scope='session')
def mfcc(audio):
    from shennong_tpu.processor.mfcc import MfccProcessor
    return MfccProcessor(dither=0).process(audio)


# --- real recordings vendored from the reference test suite --------------
#
# tests/data/ holds the reference's real speech recordings (test.wav &
# friends, see tests/data/README.md for provenance); the fixtures below
# expose them alongside the synthetic ones so parity anchors run on
# genuine speech.

REAL_DATA = os.path.join(os.path.dirname(__file__), 'data')


@pytest.fixture(scope='session')
def real_data_path():
    return REAL_DATA


@pytest.fixture(scope='session')
def real_wav_file():
    return os.path.join(REAL_DATA, 'test.wav')


@pytest.fixture(scope='session')
def real_wav_file_8k():
    return os.path.join(REAL_DATA, 'test.8k.wav')


@pytest.fixture(scope='session')
def real_wav_file_float32():
    return os.path.join(REAL_DATA, 'test.float32.wav')


@pytest.fixture(scope='session')
def real_audio(real_wav_file):
    return Audio.load(real_wav_file)


@pytest.fixture(scope='session')
def real_audio_8k(real_wav_file_8k):
    return Audio.load(real_wav_file_8k)


@pytest.fixture(scope='session')
def real_alignment_file():
    return os.path.join(REAL_DATA, 'alignment.txt')


@pytest.fixture(scope='session')
def bottleneck_original():
    """The committed output of the original BUT bottleneck extractor on
    test.wav (reference golden, see tests/data/README.md)."""
    from shennong_tpu.serializers import read_htk
    data, _period = read_htk(
        os.path.join(REAL_DATA, 'test.bottleneck.fea'))
    return data
