"""Speech feature extraction processors (Audio -> Features).

Mirrors the processor registry of the reference toolbox
(``shennong/processor/__init__.py``). Imports are lazy (PEP 562) so
that loading one processor does not pull in every backend and so the
processor/postprocessor base modules can depend on each other.
"""

_REGISTRY = {
    'SpectrogramProcessor': 'spectrogram',
    'FilterbankProcessor': 'filterbank',
    'MfccProcessor': 'mfcc',
    'PlpProcessor': 'plp',
    'EnergyProcessor': 'energy',
    'KaldiPitchProcessor': 'pitch_kaldi',
    'KaldiPitchPostProcessor': 'pitch_kaldi',
    'CrepePitchProcessor': 'pitch_crepe',
    'CrepePitchPostProcessor': 'pitch_crepe',
    'BottleneckProcessor': 'bottleneck',
    'OneHotProcessor': 'onehot',
    'FramedOneHotProcessor': 'onehot',
    'DiagUbmProcessor': 'ubm',
    'VtlnProcessor': 'vtln',
}

__all__ = sorted(_REGISTRY)


def __getattr__(name):
    if name in _REGISTRY:
        import importlib
        module = importlib.import_module(
            f'shennong_tpu.processor.{_REGISTRY[name]}')
        return getattr(module, name)
    raise AttributeError(
        f'module {__name__!r} has no attribute {name!r}')
