"""Processor instantiation for the extraction pipeline.

API-compatible with ``shennong/pipeline_manager.py``: maps config
sections to processor classes (dynamic imports to avoid loading every
backend), scans audio metadata, wires shared framing parameters and
keeps per-speaker or per-utterance CMVN accumulators.
"""

import datetime
import importlib
import re

import numpy as np

from shennong_tpu.audio import Audio
from shennong_tpu.logger import get_logger


class PipelineManager:
    """Instanciates and configures the pipeline processors"""

    valid_features = [
        'spectrogram', 'filterbank', 'mfcc', 'plp', 'bottleneck']
    """Names of the main feature extraction algorithms"""

    valid_processors = {
        'bottleneck': ('processor', 'BottleneckProcessor'),
        'energy': ('processor', 'EnergyProcessor'),
        'filterbank': ('processor', 'FilterbankProcessor'),
        'mfcc': ('processor', 'MfccProcessor'),
        'kaldi_pitch': ('processor', 'KaldiPitchProcessor'),
        'kaldi_pitch_post': ('processor', 'KaldiPitchPostProcessor'),
        'crepe_pitch': ('processor', 'CrepePitchProcessor'),
        'crepe_pitch_post': ('processor', 'CrepePitchPostProcessor'),
        'plp': ('processor', 'PlpProcessor'),
        'spectrogram': ('processor', 'SpectrogramProcessor'),
        'ubm': ('processor', 'DiagUbmProcessor'),
        'vtln': ('processor', 'VtlnProcessor'),
        'cmvn': ('postprocessor', 'CmvnPostProcessor'),
        'delta': ('postprocessor', 'DeltaPostProcessor'),
        'sliding_window_cmvn':
            ('postprocessor', 'SlidingWindowCmvnPostProcessor'),
        'vad': ('postprocessor', 'VadPostProcessor')}
    """Config-section names mapped to their (package, class)"""

    _processor_modules = {
        'crepe_pitch': 'pitch_crepe',
        'crepe_pitch_post': 'pitch_crepe',
        'kaldi_pitch': 'pitch_kaldi',
        'kaldi_pitch_post': 'pitch_kaldi',
        'sliding_window_cmvn': 'cmvn'}

    def __init__(self, config, utterances,
                 log=get_logger('manager', 'warning')):
        self._config = config
        self._utterances = utterances
        self._warps = {}
        self.log = log

        self._check_utterances()

        # scan the audio metadata once (sample rates are needed to
        # instanciate the processors)
        self._audio_metadata = {}
        for audio_file in set(utt.audio_file for utt in utterances):
            log.debug('scanning %s', audio_file)
            self._audio_metadata[audio_file] = Audio.scan(audio_file)

        log.info('scanning %s utterances...', len(self._utterances))
        self._check_audio_files()

        self.features = [
            k for k in self.config.keys() if k in self.valid_features][0]

        # framing parameters shared by the energy/pitch processors
        proc = self.get_features_processor(next(iter(self.utterances)))
        self.frame_length = proc.frame_length
        self.frame_shift = proc.frame_shift

        # one CMVN accumulator per speaker (or per utterance)
        if 'cmvn' in self.config:
            if self.config['cmvn']['by_speaker']:
                keys = set(utt.speaker for utt in self.utterances)
            else:
                keys = set(utt.name for utt in self.utterances)
            self._cmvn_processors = {
                key: self.get_processor_class('cmvn')(proc.ndims)
                for key in keys}

    @property
    def config(self):
        """The pipeline configuration"""
        return self._config

    @property
    def utterances(self):
        """Utterances on which to apply the pipeline"""
        return self._utterances

    @property
    def warps(self):
        """VTLN warps of the utterances (optional)"""
        return self._warps

    @warps.setter
    def warps(self, value):
        self._warps = value

    @property
    def audio_metadata(self):
        """Audio metadata corresponding to utterances"""
        return self._audio_metadata

    def _check_utterances(self):
        cmvn_by_speaker = (
            'cmvn' in self.config
            and self.config['cmvn'].get('by_speaker', False))
        if cmvn_by_speaker and not self.utterances.has_speakers():
            raise ValueError(
                'cmvn normalization by speaker requested '
                'but no speaker information provided')

    def _check_audio_files(self):
        total_duration = self.utterances.duration()
        speakers = (
            '' if not self.utterances.has_speakers()
            else ' from {} speakers'.format(
                len(set(utt.speaker for utt in self.utterances))))
        self.log.info(
            'processing %s utterances%s from %s audio files '
            '(total duration %s)',
            len(self.utterances), speakers, len(self.audio_metadata),
            datetime.timedelta(seconds=total_duration))

        if any(meta.nchannels != 1
               for meta in self.audio_metadata.values()):
            raise ValueError('all audio files are not mono')

        samplerates = set(
            meta.sample_rate for meta in self.audio_metadata.values())
        if len(samplerates) > 1:
            self.log.warning(
                'audio files mix several sample rates (%s); extraction '
                'will proceed but heterogeneous corpora are usually a '
                'mistake',
                ', '.join(str(s) + 'Hz' for s in samplerates))

    def _set_logger(self, processor):
        processor.log.setLevel(self.log.getEffectiveLevel())
        return processor

    @classmethod
    def get_processor_class(cls, name):
        """Dynamically import and return the processor class ``name``."""
        try:
            module_kind, class_name = cls.valid_processors[name]
        except KeyError:
            raise ValueError(
                'invalid processor "{}"'.format(name)) from None

        module_name = cls._processor_modules.get(name, name)
        module = 'shennong_tpu.{}.{}'.format(module_kind, module_name)
        try:
            module = importlib.import_module(module)
        except ModuleNotFoundError:  # pragma: nocover
            raise ValueError(
                'cannot import module "{}"'.format(module)) from None

        try:
            return module.__dict__[class_name]
        except KeyError:  # pragma: nocover
            raise ValueError(
                'cannot find class "{}" in module {}'.format(
                    class_name, module)) from None

    @classmethod
    def get_processor_params(cls, name):
        """Default parameters of processor ``name`` as a dict."""
        return cls.get_processor_class(name)().get_params()

    @classmethod
    def get_docstring(cls, processor, param, default):
        """The docstring of a processor's parameter, cleaned up for
        inclusion as a YAML comment."""
        text = getattr(
            cls.get_processor_class(processor), param).__doc__ or ''

        # flatten paragraphs into sentences, strip markup, append the
        # default value, normalize whitespace and dots
        for pattern, replacement in (
                (r'\n\n', '. '), (r'\n', ' '), (r'`', ''),
                (':func:', '')):
            text = re.sub(pattern, replacement, text)
        text += '. Default is {}.'.format(default)
        for pattern, replacement in (
                (r'\.+', '.'), (r' +', ' '), (r'\. \.', '.')):
            text = re.sub(pattern, replacement, text)
        return text.strip()

    def get_audio(self, utterance):
        """Load (and for bottleneck, resample) an utterance's audio."""
        audio = utterance.load_audio()
        if self.features != 'bottleneck':
            return audio

        # the bottleneck nets run at 8 kHz: convert here so every
        # downstream processor agrees on the rate
        self.log.debug(
            'resampling audio from %dHz@%db to %dHz@%db',
            audio.sample_rate, audio.dtype.itemsize * 8, 8000, 16)
        audio = audio.resample(8000).astype(np.int16)
        self._audio_metadata[utterance.audio_file] = Audio._metadata(
            audio.nchannels, audio.sample_rate,
            audio.nsamples, audio.duration)
        return audio

    def _rate_of(self, utterance):
        return self._audio_metadata[utterance.audio_file].sample_rate

    def get_features_processor(self, utterance):
        """The main features processor for an utterance"""
        proc = self.get_processor_class(self.features)(
            **self.config[self.features])
        try:
            proc.sample_rate = self._rate_of(utterance)
        except AttributeError:
            pass  # bottleneck pins its own sample rate
        return self._set_logger(proc)

    def get_energy_processor(self, utterance):
        """An energy processor matching the pipeline framing"""
        proc = self.get_processor_class('energy')()
        proc.frame_length = self.frame_length
        proc.frame_shift = self.frame_shift
        proc.sample_rate = self._rate_of(utterance)
        return self._set_logger(proc)

    def get_vad_processor(self, _):
        """The VAD processor of the cmvn config section"""
        return self._set_logger(
            self.get_processor_class('vad')(**self.config['cmvn']['vad']))

    def get_cmvn_processor(self, utterance):
        """The CMVN accumulator of this utterance (or its speaker)"""
        if self.config['cmvn']['by_speaker']:
            return self._cmvn_processors[utterance.speaker]
        return self._set_logger(self._cmvn_processors[utterance.name])

    def get_pitch_processor(self, utterance):
        """The pitch processor configured for an utterance"""
        params = dict(
            self.config['pitch'],
            frame_shift=self.frame_shift,
            frame_length=self.frame_length)
        params.pop('processor', None)
        params.pop('postprocessing', None)

        if self.config['pitch']['processor'] == 'crepe':
            name = 'crepe_pitch'  # crepe pins its own 16 kHz rate
        else:
            name = 'kaldi_pitch'
            params['sample_rate'] = self._rate_of(utterance)
        return self._set_logger(self.get_processor_class(name)(**params))

    def get_pitch_post_processor(self, _):
        """The pitch post-processor of the pipeline"""
        name = (
            'crepe_pitch_post'
            if self.config['pitch']['processor'] == 'crepe'
            else 'kaldi_pitch_post')
        return self._set_logger(
            self.get_processor_class(name)(
                **self.config['pitch']['postprocessing']))

    def get_delta_processor(self, _):
        """The delta post-processor of the pipeline"""
        return self._set_logger(
            self.get_processor_class('delta')(**self.config['delta']))

    def get_vtln_processor(self, _):
        """The VTLN processor of the pipeline"""
        return self._set_logger(
            self.get_processor_class('vtln')(**self.config['vtln']))

    def get_warp(self, utterance):
        """The VTLN warp of this utterance (1.0 when unset)"""
        try:
            return self.warps[utterance.name]
        except KeyError:  # pragma: nocover
            return 1.0
