"""Regenerate the frozen golden arrays in tests/data/.

Run only after verifying a deliberate numeric change (the commit
message must explain the diff):

    python tests/make_goldens.py

Writes ``golden_real.npz`` (all processors on the real reference
recording ``tests/data/test.wav``).  The synthetic ``golden.npz`` from
round 1 is left untouched unless ``--synthetic`` is passed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

from shennong_tpu.audio import Audio  # noqa: E402
from shennong_tpu.processor import (  # noqa: E402
    EnergyProcessor, FilterbankProcessor, KaldiPitchProcessor,
    MfccProcessor, PlpProcessor, SpectrogramProcessor)
from shennong_tpu.processor.pitch_kaldi import (  # noqa: E402
    KaldiPitchPostProcessor)

DATA = os.path.join(os.path.dirname(__file__), 'data')


def compute(audio):
    out = {
        'mfcc': MfccProcessor(dither=0).process(audio).data,
        'fbank': FilterbankProcessor(dither=0).process(audio).data,
        'spectrogram':
            SpectrogramProcessor(dither=0).process(audio).data,
        'plp': PlpProcessor(dither=0).process(audio).data,
        'rastaplp':
            PlpProcessor(dither=0, rasta=True).process(audio).data,
        'energy': EnergyProcessor(dither=0).process(audio).data,
    }
    pitch = KaldiPitchProcessor().process(audio)
    out['pitch'] = pitch.data
    out['pitch_post'] = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0).process(pitch).data
    return out


def main():
    audio = Audio.load(os.path.join(DATA, 'test.wav'))
    arrays = compute(audio)
    path = os.path.join(DATA, 'golden_real.npz')
    np.savez_compressed(path, **arrays)
    print(f'wrote {path}:',
          {k: v.shape for k, v in arrays.items()})

    if '--synthetic' in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        from tests.conftest import make_speech_like_signal
        signal = make_speech_like_signal(22713, 16000)
        arrays = compute(Audio(signal, 16000))
        path = os.path.join(DATA, 'golden.npz')
        np.savez_compressed(path, **arrays)
        print(f'wrote {path}')


if __name__ == '__main__':
    main()
