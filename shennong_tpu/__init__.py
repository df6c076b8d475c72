"""shennong_tpu: a TPU-native speech features extraction toolbox.

A from-scratch JAX/XLA re-design of the feature extraction stack of
the ``bootphon/shennong`` toolbox. Every numeric kernel that the
reference delegates to Kaldi C++ (framing, windowing, mel filterbanks,
MFCC/PLP/spectrogram, pitch tracking, CMVN, deltas, VAD, GMM/VTLN) is
implemented as batched, fused XLA computations that run on TPU, while
the user-facing API (Audio, Features, FeaturesCollection, Utterances,
processors, pipeline, ``speech-features`` CLI) stays compatible with
the reference.
"""

import datetime
import textwrap

__version__ = '1.0'

from shennong_tpu.audio import Audio
from shennong_tpu.features import Features
from shennong_tpu.features_collection import FeaturesCollection
from shennong_tpu.utterances import Utterance, Utterances


def url():
    """URL of the project documentation"""
    return 'https://github.com/shennong-tpu/shennong-tpu'


def version(type=str, full=False):
    """The package version, as a string or a tuple"""
    if type not in (str, tuple, 'str', 'tuple'):
        raise ValueError(
            'version type must be str or tuple, it is {}'.format(type))

    vers = tuple(__version__.split('.'))
    if not full:
        vers = vers[:3]
    return vers if type in (tuple, 'tuple') else '.'.join(vers)


def version_long():
    """Version plus copyright and license info, for --version output"""
    return textwrap.dedent('''\
    shennong-tpu-{}
    TPU-native rebuild of the shennong speech features toolbox ({})
    licence GPL3: this is free software, see the source for copying conditions
    '''.format(version(), datetime.date.today().year))
