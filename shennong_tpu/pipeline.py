"""High-level features extraction pipeline (YAML config driven).

API-compatible with ``shennong/pipeline.py``: build a default
configuration with :func:`get_default_config` (optionally as a
commented YAML string), run it with :func:`extract_features`.

Execution model difference versus the reference: where the reference
fans per-utterance jobs out to joblib threads (the Kaldi C++ releases
the GIL), here both passes run as whole-collection batched device
programs — pass 1 extracts features/pitch/VAD in padded length
buckets, the (associative) CMVN statistics are reduced between the
passes, and pass 2 applies CMVN as a host affine and the deltas as one
masked device program per frame bucket (O(buckets) dispatches per
stage, not O(utterances)).
"""

import os
import textwrap

import numpy as np
import yaml

from shennong_tpu import Features, FeaturesCollection
from shennong_tpu.logger import get_logger, null_logger
from shennong_tpu.utils import get_njobs
from shennong_tpu.pipeline_manager import PipelineManager


def valid_features():
    """The features extractable by the pipeline (no post-processing)"""
    return PipelineManager.valid_features


def get_default_config(
        features,
        to_yaml=False,
        yaml_commented=True,
        with_pitch=False,
        with_cmvn=False,
        with_delta=False,
        with_vtln=False):
    """Build a default pipeline configuration.

    Parameters
    ----------
    features : str
        One of :func:`valid_features`.
    to_yaml : bool, optional
        When True return a YAML string instead of a dict.
    yaml_commented : bool, optional
        When True (and ``to_yaml``) document every parameter with its
        docstring as a YAML comment.
    with_pitch : False, 'kaldi' or 'crepe', optional
        Include pitch extraction.
    with_cmvn : bool, optional
        Include CMVN normalization (by speaker, with VAD).
    with_delta : bool, optional
        Include delta features.
    with_vtln : False, 'simple' or 'full', optional
        Include VTLN warping ('simple' hides the inner features
        configuration). Incompatible with spectrogram and bottleneck.

    Returns
    -------
    config : dict or str
    """
    if features not in valid_features():
        raise ValueError('invalid features "{}", must be in {}'.format(
            features, ', '.join(valid_features())))

    if with_pitch not in (False, 'kaldi', 'crepe'):
        raise ValueError(
            f'with_pitch argument must be False, "kaldi" or "crepe" '
            f'but is "{with_pitch}"')

    if with_vtln not in (False, 'simple', 'full'):
        raise ValueError(
            f'with_vtln argument must be False, "simple" or "full" '
            f'but is "{with_vtln}"')

    if with_vtln and features in ('spectrogram', 'bottleneck'):
        raise ValueError(
            f'VTLN is not compatible with {features} features')

    config = {}

    # sample_rate is determined by the input audio, htk_compat is not
    # exposed through the pipeline
    config[features] = {
        k: v for k, v in
        PipelineManager.get_processor_params(features).items()
        if k not in ('sample_rate', 'htk_compat')}

    if with_pitch:
        config['pitch'] = {'processor': with_pitch}
        for key, value in PipelineManager.get_processor_params(
                f'{with_pitch}_pitch').items():
            if key not in ('frame_length', 'frame_shift', 'sample_rate'):
                config['pitch'][key] = value
        config['pitch']['postprocessing'] = (
            PipelineManager.get_processor_params(f'{with_pitch}_pitch_post'))

    if with_cmvn:
        config['cmvn'] = {'by_speaker': True, 'with_vad': True}
        config['cmvn']['vad'] = PipelineManager.get_processor_params('vad')

    if with_delta:
        config['delta'] = PipelineManager.get_processor_params('delta')

    if with_vtln:
        config['vtln'] = PipelineManager.get_processor_params('vtln')
        if with_vtln == 'simple':
            config['vtln']['features'] = 'default'
            config['vtln']['ubm']['features'] = 'default'

    if to_yaml:
        return _config_to_yaml(config, comments=yaml_commented)
    return config


def extract_features(
        configuration,
        utterances,
        warps=None,
        njobs=1,
        fetch_dtype=None,
        log=get_logger('pipeline', 'warning')):
    """Run a features extraction pipeline over ``utterances``.

    Parameters
    ----------
    configuration : dict or str
        Pipeline configuration (dict, YAML string or YAML file path),
        see :func:`get_default_config`.
    utterances : :class:`~shennong_tpu.utterances.Utterances`
        The utterances to process.
    warps : dict, optional
        Precomputed VTLN warps indexed by speaker or utterance
        (exclusive with a 'vtln' config section).
    njobs : int, optional
        Host-side parallelism for audio IO (device execution does not
        depend on it).
    fetch_dtype : str, optional
        Precision of the device->host feature fetch on the fused
        pass-1 path: 'float32' (default, bit-exact), 'float16' or
        'bfloat16' (HALF the fetched bytes — for bandwidth-starved
        host-device links, when the downstream serializer is lossy or
        float32 anyway; outputs are upcast to float32 but carry the
        reduced precision, roughly 1e-3 relative for 'float16').
        Ignored by the per-utterance and stage-wise fallback paths.
    log : logging.Logger, optional

    Returns
    -------
    features : :class:`~shennong_tpu.features_collection.FeaturesCollection`
    """
    njobs = get_njobs(njobs, log=log)
    config = init_config(configuration, log=log)

    log.info(
        'detected format for utterances index is: %s',
        utterances.format(type=str))

    if warps:
        warps = _init_warps(warps, config, utterances, log)

    return _extract_features(
        config, utterances, warps, njobs=njobs,
        fetch_dtype=fetch_dtype, log=log)


def extract_features_warp(configuration, utterances, warp, log, njobs=1):
    """Extract features with a single global VTLN warp.

    Used internally by VTLN training to build the per-warp feature
    sets; the whole collection runs as batched device programs.
    """
    from shennong_tpu.parallel.executor import BatchExecutor

    njobs = get_njobs(njobs, log=log)
    config = init_config(configuration, log=log)
    manager = PipelineManager(config, utterances, log=log)

    utterances = list(utterances)
    rates = set(
        meta.sample_rate for meta in manager.audio_metadata.values())
    if manager.features != 'bottleneck' and len(rates) == 1:
        proc = manager.make('features', utterances[0])
        warps = {utt.name: float(warp) for utt in utterances}
        features = BatchExecutor(proc).process_all(
            utterances, vtln_warp=warps, njobs=njobs)
        if 'delta' in config:
            # batched (this path runs once per warp class in the
            # LVTLN fallback — a per-utterance loop would pay one
            # device dispatch per utterance per class)
            delta = manager.make('delta')
            names = list(features.keys())
            outputs = _batched_deltas(
                [features[name].data for name in names], delta)
            features = FeaturesCollection({
                name: Features(
                    out.astype(features[name].dtype),
                    features[name].times,
                    delta.get_properties(features[name]))
                for name, out in zip(names, outputs)})
        return features

    features = FeaturesCollection()
    for utterance in utterances:
        name, feats = _process_one(
            utterance, manager, log, warp=warp, with_pitch=False)
        features[name] = feats
    return features


def extract_features_warp_classes(
        configuration, utterances, class_warps, log, njobs=1):
    """Extract MFCC features for a whole list of VTLN warp classes.

    The LVTLN base-transform training needs the same utterances
    warped at every class (41 by default); this runs the framing and
    the DFT once and fans only the mel bank out over classes
    (:func:`shennong_tpu.ops.spectral.mfcc_multi_warp_batch`).
    Returns one FeaturesCollection per warp. Falls back to per-class
    :func:`extract_features_warp` when the configuration is not a
    plain single-rate MFCC setup.
    """
    from shennong_tpu.parallel.executor import BatchExecutor

    njobs = get_njobs(njobs, log=log)
    config = init_config(configuration, log=log)
    manager = PipelineManager(config, utterances, log=log)

    utterances = list(utterances)
    rates = set(
        meta.sample_rate for meta in manager.audio_metadata.values())
    if manager.features == 'mfcc' and len(rates) == 1:
        proc = manager.make('features', utterances[0])
        collections = BatchExecutor(proc).process_all_classes(
            utterances, [float(w) for w in class_warps], njobs=njobs)
        if 'delta' in config:
            # one flat batched delta pass over all (class, utterance)
            # matrices — a per-item loop would pay 41 x n_utterances
            # device dispatches
            delta = manager.make('delta')
            keys = [
                (c, name) for c, collection in enumerate(collections)
                for name in collection.keys()]
            arrays = [collections[c][name].data for c, name in keys]
            outputs = _batched_deltas(arrays, delta)
            for (c, name), out in zip(keys, outputs):
                feats = collections[c][name]
                collections[c][name] = Features(
                    out.astype(feats.dtype), feats.times,
                    delta.get_properties(feats))
        return collections

    return [
        extract_features_warp(
            configuration, utterances, warp, log, njobs=njobs)
        for warp in class_warps]


def accumulate_warp_mapping_stats(
        configuration, utterances, class_warps, keep, log, njobs=1,
        signal_cache=None):
    """Fused LS statistics for the LVTLN base-transform training.

    Instead of materializing 41 warped feature collections
    (:func:`extract_features_warp_classes`), accumulate the per-class
    centered least-squares moments directly on device — the warped
    features never reach the host. ``keep`` maps utterance names to
    per-frame selection weights (VAD + subsampling).

    Returns the per-batch moments list for
    :func:`shennong_tpu.ops.fmllr.solve_mapping_from_moments`, or
    None when the configuration is not a plain single-rate MFCC setup
    (the caller then falls back to the per-collection path).
    """
    from shennong_tpu.parallel.executor import BatchExecutor

    njobs = get_njobs(njobs, log=log)
    config = init_config(configuration, log=log)
    manager = PipelineManager(config, utterances, log=log)

    utterances = list(utterances)
    rates = set(
        meta.sample_rate for meta in manager.audio_metadata.values())
    if manager.features != 'mfcc' or len(rates) != 1:
        return None

    proc = manager.make('features', utterances[0])

    # hour-scale utterances would blow the fused [classes, B, T, D]
    # program; fall back to the per-collection path, whose executor
    # routes them through chunked extraction
    limit = proc.AUTO_CHUNK_FRAMES
    if limit and any(
            proc.output_frames(
                int(utt.duration * float(proc.sample_rate))) > limit
            for utt in utterances):
        return None

    delta_order = delta_window = None
    if 'delta' in config:
        delta_proc = manager.make('delta')
        delta_order = delta_proc.order
        delta_window = delta_proc.window
    return BatchExecutor(proc).accumulate_lvtln_stats(
        utterances, [float(w) for w in class_warps], keep,
        delta_order=delta_order, delta_window=delta_window,
        njobs=njobs, signal_cache=signal_cache)


def init_config(config, log=get_logger('pipeline', 'warning')):
    """Validate and normalize a pipeline configuration.

    Accepts a dict, a YAML string or a YAML file path; fills the
    defaulted cmvn/pitch sub-sections and checks overall consistency.
    """
    try:
        if os.path.isfile(config):
            log.debug('loading configuration from %s', config)
            with open(config, 'r') as fp:
                config = fp.read()
    except TypeError:
        pass

    if isinstance(config, str):
        try:
            config = yaml.load(config, Loader=yaml.FullLoader)
        except yaml.YAMLError as err:
            raise ValueError(f'error in configuration: {err}') from None

    unknown_keys = [
        k for k in config.keys()
        if k not in list(PipelineManager.valid_processors) + ['pitch']]
    if unknown_keys:
        raise ValueError(
            'invalid keys in configuration: {}'.format(
                ', '.join(unknown_keys)))

    features = [k for k in config.keys() if k in valid_features()]
    if not features:
        raise ValueError(
            'the configuration does not define any features extraction '
            '(must have one and only one entry of {})'
            .format(', '.join(valid_features())))
    if len(features) > 1:
        raise ValueError(
            'more than one features extraction processors are defined, '
            '(must have one and only one entry of {}): {}'
            .format(', '.join(valid_features()), ', '.join(features)))

    if 'vtln' in config and features[0] in ('spectrogram', 'bottleneck'):
        raise ValueError(f'{features[0]} features do not support VTLN')

    if 'cmvn' in config:
        if 'by_speaker' not in config['cmvn']:
            log.warning(
                'by_speaker option not specified for cmvn, '
                'assuming it is false and doing cmvn by utterance')
            config['cmvn']['by_speaker'] = False
        if 'with_vad' not in config['cmvn']:
            config['cmvn']['with_vad'] = True

    if 'pitch' in config:
        if 'processor' not in config['pitch']:
            # the reference dies with a bare KeyError here; an
            # explicit message beats that (the key is genuinely
            # ambiguous: kaldi or crepe)
            raise ValueError(
                "the pitch configuration must declare its processor "
                "('kaldi' or 'crepe')")
        if 'postprocessing' not in config['pitch']:
            config['pitch']['postprocessing'] = {}

    if 'vtln' in config and 'by_speaker' not in config['vtln']:
        # default to the VtlnProcessor default (the reference dies
        # with a bare KeyError on this valid minimal section)
        log.warning(
            'by_speaker option not specified for vtln, '
            'assuming it is true and computing warps by speaker')
        config['vtln']['by_speaker'] = True

    steps = []
    if 'pitch' in config:
        steps.append(f'{config["pitch"]["processor"]} pitch')
    if 'delta' in config:
        steps.append('delta')
    if 'cmvn' in config:
        steps.append('cmvn by {}{}'.format(
            'speaker' if config['cmvn']['by_speaker'] else 'utterance',
            ' with vad' if config['cmvn']['with_vad'] else ''))
    if 'vtln' in config:
        steps.append('vtln by {}'.format(
            'speaker' if config['vtln']['by_speaker'] else 'utterance'))
    log.info(
        'pipeline configured for %s features extraction%s',
        features[0], ' with {}'.format(', '.join(steps)) if steps else '')

    return config


def _init_warps(warps, config, utterances, log):
    features = [k for k in config.keys() if k in valid_features()][0]
    if features in ('spectrogram', 'bottleneck'):
        raise ValueError(f'{features} features do not support VTLN')

    if 'vtln' in config:
        raise ValueError(
            'warps are given but "vtln" processor already defined '
            'in the configuration')

    if warps.keys() == utterances.by_name().keys():
        log.info('VTLN warps are defined by utterance')
    elif (utterances.has_speakers()
          and warps.keys() == utterances.by_speaker().keys()):
        log.info('VTLN warps are defined by speaker')
        warps = {utt.name: warps[utt.speaker] for utt in utterances}
    else:
        raise ValueError(
            'warps do not match utterances, either by speaker or by '
            'utterance')

    return {name: float(warp) for name, warp in warps.items()}


def _extract_features(config, utterances, warps, log, njobs=1,
                      fetch_dtype=None):
    manager = PipelineManager(config, utterances, log=log)

    # vtln: compute warps or install precomputed ones. VTLN training
    # and the warped extraction that follows stream the same audio:
    # one device-signal cache spans both so the corpus uploads once
    signal_cache = None
    if warps:
        manager.warps = warps
    elif 'vtln' in config:
        from shennong_tpu.parallel.stream import SignalCache
        signal_cache = SignalCache()
        vtln_proc = manager.make('vtln')
        vtln_proc._signal_cache = signal_cache
        try:
            manager.warps = vtln_proc.process(utterances, njobs=njobs)
        finally:
            vtln_proc.__dict__.pop('_signal_cache', None)

    # fused pass 1 with pass 2 overlapped into the fetch waits
    # whenever the whole collection shares one device program
    collection = _overlapped_fused_extract(
        manager, utterances, log, njobs, signal_cache=signal_cache,
        fetch_dtype=fetch_dtype)
    if collection is not None:
        return collection

    # batched pass 1 for the remaining batched configurations
    # (bottleneck and crepe pitch keep their own internal batching)
    pass_one = _batched_pass_one(
        manager, utterances, log, njobs, signal_cache=signal_cache,
        fetch_dtype=fetch_dtype)
    if pass_one is None:
        pass_one = [
            _extract_pass_one(utterance, manager, log=log)
            for utterance in utterances]

    return _batched_pass_two(manager, pass_one, log)


def _batched_pass_one(manager, utterances, log, njobs,
                      signal_cache=None, fetch_dtype=None):
    """Pass 1 as whole-collection batched device programs.

    Returns the same (utterance, features, pitch) triplets as the
    sequential :func:`_extract_pass_one`, or None when the
    configuration requires the per-utterance path (bottleneck
    features, heterogeneous sample rates).
    """
    from shennong_tpu.parallel.executor import BatchExecutor

    config = manager.config
    if manager.features == 'bottleneck':
        return None
    rates = set(
        meta.sample_rate for meta in manager.audio_metadata.values())
    if len(rates) != 1:
        return None

    utterances = list(utterances)
    first = utterances[0]

    outputs = _fused_pass_one(
        manager, utterances, log, njobs, signal_cache=signal_cache,
        fetch_dtype=fetch_dtype)
    if outputs is not None:
        feats_collection, vads, pitches = outputs
    else:
        log.debug('batched extraction of %s', manager.features)
        proc = manager.make('features', first)
        warp_arg = dict(manager.warps) if manager.warps else None
        # the stage-wise path sweeps the corpus once per stage
        # (features, energy/VAD, pitch): a signal cache uploads the
        # audio once and replays it for the later sweeps
        sweeps = (1
                  + ('cmvn' in config and config['cmvn']['with_vad'])
                  + ('pitch' in config
                     and config['pitch']['processor'] != 'crepe'))
        if signal_cache is None and sweeps > 1:
            from shennong_tpu.parallel.stream import SignalCache
            signal_cache = SignalCache()
        feats_collection = BatchExecutor(proc).process_all(
            utterances, vtln_warp=warp_arg, njobs=njobs,
            signal_cache=signal_cache)

        if 'cmvn' in config and config['cmvn']['with_vad']:
            log.debug('batched energy + vad')
            energies = BatchExecutor(
                manager.make('energy', first)).process_all(
                    utterances, njobs=njobs,
                    signal_cache=signal_cache)
            vads = {
                name: vad.data.reshape(-1)
                for name, vad in
                manager.make('vad').process_all(energies).items()}
        else:
            vads = None

        if 'pitch' in config:
            log.debug('batched pitch extraction')
            pitch_proc = manager.make('pitch', first)
            if config['pitch']['processor'] == 'crepe':
                # crepe batches internally (one CNN pass over the
                # corpus with its own framing geometry)
                pitch_raw = pitch_proc.process_all(
                    utterances, njobs=njobs)
            else:
                pitch_raw = BatchExecutor(pitch_proc).process_all(
                    utterances, njobs=njobs,
                    signal_cache=signal_cache)
            pitch_post = manager.make('pitch_post')
            if config['pitch']['processor'] == 'kaldi':
                # batched: O(frame buckets) device programs instead of
                # one dispatch per utterance (each pays the fixed
                # relay floor)
                pitches = pitch_post.process_collection(pitch_raw)
            else:
                # crepe post runs voicing/interpolation host-side per
                # utterance before delegating to the kaldi post kernel
                pitches = {
                    name: pitch_post.process(raw)
                    for name, raw in pitch_raw.items()}
        else:
            pitches = None

    triplets = []
    for utterance in utterances:
        features = feats_collection[utterance.name]

        if 'cmvn' in config:
            manager.accumulate_cmvn(
                utterance, features,
                weights=vads[utterance.name] if vads else None)

        if utterance.speaker:
            features.properties['speaker'] = utterance.speaker
        features.properties['audio'] = {
            'file': os.path.abspath(utterance.audio_file),
            'sample_rate': manager.audio_metadata[
                utterance.audio_file].sample_rate}
        if utterance.tstart is not None:
            features.properties['audio']['tstart'] = utterance.tstart
            features.properties['audio']['tstop'] = utterance.tstop
        features.properties['audio']['duration'] = utterance.duration

        triplets.append((
            utterance, features,
            pitches[utterance.name] if pitches else None))
    return triplets


def _overlapped_fused_extract(manager, utterances, log, njobs,
                              signal_cache=None, fetch_dtype=None):
    """Fused pass 1 with pass 2 overlapped into the relay waits.

    Pass 2 only needs an utterance's CMVN group (its speaker, or just
    itself) to be complete — not the whole corpus. So instead of
    draining every batch before any pass-2 work starts (the
    reference's two sequential joblib pools,
    ``shennong/pipeline.py:545-567``), the fused executor hands each
    utterance over as its batch payload lands: its CMVN statistics
    are computed immediately (CPU work hidden inside the next batch's
    fetch wait), and once a group's last utterance arrives, that
    group's pass 2 (CMVN apply + deltas + pitch concatenation) runs
    on a worker thread while later batches are still in flight. On a
    relay-attached host the fetch waits are pure I/O, so pass 2 rides
    inside them instead of extending the critical path.

    Outputs are bit-identical to the sequential flow: per-utterance
    statistics reduce into the group accumulator in the original
    utterance order, and each group's pass 2 is
    :func:`_batched_pass_two_impl` over the same triplets.

    Returns the final FeaturesCollection, or None when the
    configuration needs a different pass-1 path.
    """
    import queue
    import threading

    from shennong_tpu.ops.postops import accumulate_cmvn_stats
    from shennong_tpu.parallel.profiler import counters

    config = manager.config
    rates = set(
        meta.sample_rate for meta in manager.audio_metadata.values())
    if len(rates) != 1:
        return None

    utterances = list(utterances)
    executor = _make_fused_executor(
        manager, utterances, log, signal_cache=signal_cache,
        fetch_dtype=fetch_dtype)
    if executor is None:
        return None

    with_cmvn = 'cmvn' in config
    utt_by_name = {utt.name: utt for utt in utterances}

    # CMVN group -> member names in original utterance order (the
    # accumulation order of the sequential flow); without CMVN every
    # utterance is its own group and finishes as soon as it lands
    groups = {}
    for utt in utterances:
        key = manager.cmvn_key(utt) if with_cmvn else utt.name
        groups.setdefault(key, []).append(utt.name)
    group_of = {
        name: key for key, names in groups.items() for name in names}
    pending = {key: len(names) for key, names in groups.items()}

    landed = {}    # name -> (utterance, features, pitch) triplet
    stats = {}     # name -> per-utterance CMVN statistics
    results = {}   # name -> final Features
    work = queue.Queue()
    failure = []
    done = object()

    def finish_group(key):
        if with_cmvn:
            for name in groups[key]:
                manager.cmvn_stats[key] += stats.pop(name)
        triplets = [landed.pop(name) for name in groups[key]]
        with counters.timed('pass2_s'):
            finished = _batched_pass_two_impl(manager, triplets, log)
        results.update(finished)

    def worker():
        while True:
            key = work.get()
            if key is done:
                return
            try:
                finish_group(key)
            except BaseException as exc:  # re-raised on the main thread
                failure.append(exc)
                return

    def on_utterance(name, features, vad, pitch):
        utterance = utt_by_name[name]
        if with_cmvn:
            stats[name] = accumulate_cmvn_stats(
                features.data, weights=vad)
        if utterance.speaker:
            features.properties['speaker'] = utterance.speaker
        features.properties['audio'] = {
            'file': os.path.abspath(utterance.audio_file),
            'sample_rate': manager.audio_metadata[
                utterance.audio_file].sample_rate}
        if utterance.tstart is not None:
            features.properties['audio']['tstart'] = utterance.tstart
            features.properties['audio']['tstop'] = utterance.tstop
        features.properties['audio']['duration'] = utterance.duration
        landed[name] = (utterance, features, pitch)
        key = group_of[name]
        pending[key] -= 1
        if pending[key] == 0 and not failure:
            work.put(key)

    log.debug(
        'fused pass 1 with overlapped pass 2 over %d groups',
        len(groups))
    thread = threading.Thread(
        target=worker, name='pass-two', daemon=True)
    thread.start()
    try:
        executor.run(utterances, njobs=njobs, on_utterance=on_utterance)
    finally:
        work.put(done)
        thread.join()
    if failure:
        raise failure[0]

    collection = FeaturesCollection()
    for utt in utterances:
        collection[utt.name] = results[utt.name]
    return collection


def _fused_pass_one(manager, utterances, log, njobs,
                    signal_cache=None, fetch_dtype=None):
    """Pass 1 through the fused single-program-per-batch executor.

    Returns ``(features, vads, pitches)`` or None when the
    configuration needs the stage-wise path (CREPE pitch,
    hour-scale utterances routed through chunked extraction).
    """
    executor = _make_fused_executor(
        manager, utterances, log, signal_cache=signal_cache,
        fetch_dtype=fetch_dtype)
    if executor is None:
        return None
    return executor.run(utterances, njobs=njobs)


def _make_fused_executor(manager, utterances, log,
                         signal_cache=None, fetch_dtype=None):
    """A FusedPipelineExecutor for this configuration, or None when
    the configuration needs the stage-wise path (CREPE pitch,
    hour-scale utterances routed through chunked extraction)."""
    from shennong_tpu.parallel.executor import FusedPipelineExecutor

    config = manager.config
    if manager.features not in (
            'mfcc', 'filterbank', 'plp', 'spectrogram'):
        return None
    if 'pitch' in config and config['pitch']['processor'] != 'kaldi':
        return None

    first = utterances[0]
    proc = manager.make('features', first)
    with_vad = 'cmvn' in config and config['cmvn']['with_vad']
    with_pitch = 'pitch' in config

    # hour-scale utterances need the chunked halo path; the pitch
    # tracker has its own (usually denser) frame grid and limit, so
    # check every fused processor, not just the feature one
    chunk_procs = [proc]
    if with_pitch:
        chunk_procs.append(manager.make('pitch', first))
    for cproc in chunk_procs:
        limit = getattr(cproc, 'AUTO_CHUNK_FRAMES', None)
        if not limit:
            continue
        for utt in utterances:
            frames = cproc.output_frames(
                int(utt.duration * float(cproc.sample_rate)))
            if frames > limit:
                return None
    log.debug('fused pass 1 (%s%s%s)', manager.features,
              '+vad' if with_vad else '',
              '+pitch' if with_pitch else '')
    executor = FusedPipelineExecutor(
        proc,
        warps=dict(manager.warps) if manager.warps else None,
        energy_proc=(
            manager.make('energy', first) if with_vad else None),
        vad_proc=manager.make('vad') if with_vad else None,
        pitch_proc=(
            manager.make('pitch', first) if with_pitch else None),
        pitch_post=(
            manager.make('pitch_post') if with_pitch else None),
        signal_cache=signal_cache,
        fetch_dtype=fetch_dtype or 'float32')
    return executor


def _extract_pass_one(utterance, manager, log):
    log.debug('%s: load audio', utterance.audio_file)
    audio = manager.get_audio(utterance)

    log.debug('%s: extract %s', utterance.name, manager.features)
    if manager.warps:
        features = manager.make('features', utterance).process(
            audio, vtln_warp=manager.get_warp(utterance))
    else:
        features = manager.make('features', utterance).process(audio)

    if 'cmvn' in manager.config:
        log.debug('%s: accumulate cmvn', utterance.name)
        if manager.config['cmvn']['with_vad']:
            energy = manager.make('energy', utterance).process(audio)
            vad = manager.make('vad').process(energy)
            vad = vad.data.reshape((vad.shape[0],))
        else:
            vad = None
        manager.accumulate_cmvn(utterance, features, weights=vad)

    if 'pitch' in manager.config:
        log.debug(
            '%s: extract %s pitch', utterance.name,
            manager.config['pitch']['processor'])
        pitch = manager.make('pitch', utterance).process(audio)
        pitch = manager.make('pitch_post').process(pitch)
    else:
        pitch = None

    if utterance.speaker:
        features.properties['speaker'] = utterance.speaker
    features.properties['audio'] = {
        'file': os.path.abspath(utterance.audio_file),
        'sample_rate': manager.audio_metadata[
            utterance.audio_file].sample_rate}
    if utterance.tstart is not None:
        features.properties['audio']['tstart'] = utterance.tstart
        features.properties['audio']['tstop'] = utterance.tstop
    features.properties['audio']['duration'] = utterance.duration

    return utterance, features, pitch


def _batched_pass_two(manager, triplets, log, tolerance=2):
    """Pass 2 over the whole collection: CMVN apply (a host-side
    affine, no device work), deltas as one device program per frame
    bucket instead of one per utterance, pitch concatenation host-side.

    Replaces the reference's second joblib pool
    (``shennong/pipeline.py:552-567``); outputs are identical to the
    per-utterance :func:`_extract_pass_two`.
    """
    from shennong_tpu.parallel.profiler import counters

    with counters.timed('pass2_s'):
        return _batched_pass_two_impl(manager, triplets, log, tolerance)


def _batched_pass_two_impl(manager, triplets, log, tolerance=2):
    """Consumes ``triplets`` destructively (entries are dropped as
    they are processed): at corpus scale each stage's arrays are
    hundreds of MB, and the pass-1 features are views pinning whole
    padded batch payloads — releasing every input as soon as its
    replacement exists keeps peak host memory at ~one stage instead
    of all four (original / CMVN / delta / concatenated)."""
    config = manager.config

    staged = []
    for index in range(len(triplets)):
        utterance, features, pitch = triplets[index]
        triplets[index] = None
        if 'cmvn' in config:
            log.debug('%s: apply cmvn', utterance.name)
            features = manager.apply_cmvn(utterance, features)
        staged.append((utterance, features, pitch))
    triplets.clear()

    collection = FeaturesCollection()

    def finish(utterance, features, pitch):
        if pitch:
            log.debug('%s: concatenate pitch', utterance.name)
            features = features.concatenate(
                pitch, tolerance=tolerance, log=log, validate=False)
        collection[utterance.name] = features

    if 'delta' in config:
        log.debug('batched delta over %d utterances', len(staged))
        delta_proc = manager.make('delta')

        def flush(chunk):
            # validate=False: times are untouched and the delta
            # filter of finite (already-validated) input is finite —
            # re-validating would re-scan every output matrix
            # (measured ~40% of pass 2). copy=False: the host delta
            # outputs are already float32
            outputs = _batched_deltas(
                [staged[i][1].data for i in chunk], delta_proc)
            for i, out in zip(chunk, outputs):
                utterance, features, pitch = staged[i]
                staged[i] = None
                finish(
                    utterance,
                    Features(out.astype(features.dtype, copy=False),
                             features.times,
                             delta_proc.get_properties(features),
                             validate=False),
                    pitch)

        # bounded chunks (~64 MB of input rows): deltas triple the
        # bytes, so computing the whole corpus's outputs before any
        # final Features exist would hold input + 3x output + final
        # all at once; per-chunk flushing keeps the transient at one
        # chunk while inputs free as they are consumed
        chunk, chunk_bytes = [], 0
        for index in range(len(staged)):
            chunk.append(index)
            chunk_bytes += staged[index][1].data.nbytes
            if chunk_bytes >= 64 << 20:
                flush(chunk)
                chunk, chunk_bytes = [], 0
        if chunk:
            flush(chunk)
    else:
        for index in range(len(staged)):
            utterance, features, pitch = staged[index]
            staged[index] = None
            finish(utterance, features, pitch)
    return collection


def _batched_deltas(arrays, proc):
    """Delta features of many [T_i, D] matrices, computed on the host
    (:func:`shennong_tpu.ops.postops.compute_deltas_host`): the delta
    filter is ~9 multiply-adds per output value, far below the cost of
    shipping the matrices to the device and 3x their size back.
    Returns the per-utterance float32 outputs in order."""
    from shennong_tpu.ops import postops

    return [
        out.astype(np.float32) for out in postops.compute_deltas_host(
            arrays, order=proc.order, window=proc.window)]


def _extract_pass_two(utterance, manager, features, pitch, log,
                      tolerance=2):
    if 'cmvn' in manager.config:
        log.debug('%s: apply cmvn', utterance.name)
        features = manager.apply_cmvn(utterance, features)

    if 'delta' in manager.config:
        log.debug('%s: apply delta', utterance.name)
        features = manager.make('delta').process(features)

    if pitch:
        log.debug('%s: concatenate pitch', utterance.name)
        features = features.concatenate(pitch, tolerance=tolerance, log=log)

    return utterance.name, features


def _extract_single_pass(utterance, manager, log):
    _, features, pitch = _extract_pass_one(utterance, manager, log=log)
    return _extract_pass_two(utterance, manager, features, pitch, log=log)


def _process_one(utterance, manager, log, warp=None, with_pitch=True):
    """Single utterance with an explicit warp, no cmvn (VTLN training)."""
    log.debug('%s: load audio', utterance.name)
    audio = manager.get_audio(utterance)

    log.debug('%s: extract %s', utterance.name, manager.features)
    features = manager.make('features', utterance).process(
        audio, vtln_warp=warp)

    if 'delta' in manager.config:
        log.debug('%s: apply delta', utterance.name)
        features = manager.make('delta').process(features)

    return utterance.name, features


def _config_to_yaml(config, comments=True):
    """Serialize a configuration dict to YAML, with the parameters
    docstrings as comments when requested."""
    # keep the dict insertion order in the YAML output
    yaml.add_representer(
        dict, lambda self, data:
        yaml.representer.SafeRepresenter.represent_dict(self, data.items()))
    # numpy scalars must be converted to Python types before dumping
    # (their numpy-2 repr is not YAML-parsable)
    for np_type in (np.float32, np.float64):
        yaml.add_representer(
            np_type, lambda dumper, d: dumper.represent_float(float(d)))
    for np_type in (np.int32, np.int64):
        yaml.add_representer(
            np_type, lambda dumper, d: dumper.represent_int(int(d)))
    yaml.add_representer(
        np.bool_, lambda dumper, d: dumper.represent_bool(bool(d)))

    try:
        pitch_processor = config['pitch']['processor']
    except KeyError:
        pitch_processor = None

    config = yaml.dump(config).strip()
    if not comments:
        return config + '\n'

    commented = []
    processors = []
    prev_offset = 0
    for line in config.split('\n'):
        key = line.split(': ')[0]
        offset = len(key) - len(key.strip())
        for _ in range((prev_offset - offset) // 2):
            processors.pop()
        if line.endswith(':'):
            processor = line[:-1].strip()
            if processor == 'postprocessing':
                processor = f'{processors[-1]}_post'
            processors.append(processor)
            if processor == 'vad' and offset != 4:
                commented.append(
                    "  # The vad options are not used if 'with_vad' "
                    "is false")
            commented.append(line)
        else:
            param = line.split(': ')[0].strip()
            default = line.split(': ')[1].strip()
            processor = processors[-1]

            if processor == 'cmvn' and param == 'by_speaker':
                docstring = (
                    'If false, do normalization by utterance, '
                    'if true do normalization by speaker.')
            elif processor == 'cmvn' and param == 'with_vad':
                docstring = (
                    'If true do normalization only on frames where '
                    'voice activity has been detected, if false do not '
                    'consider voice activity for normalization.')
            elif param == 'features' and default == 'default':
                docstring = (
                    'Features extraction configuration. Default is to use '
                    'MFCCs with default parameters. Regenerate this '
                    'configuration file with "speech-features config" using '
                    'the "--vtln-full" option to expose all the parameters.')
            elif processor == 'pitch' and param == 'processor':
                docstring = f'Computing pitch using {pitch_processor}'
            elif 'pitch' in processor and param != 'processor':
                docstring = PipelineManager.get_docstring(
                    pitch_processor + '_' + processor, param, default)
            else:
                docstring = PipelineManager.get_docstring(
                    processor, param, default)

            commented += [
                ' ' * offset + '# ' + wrapped
                for wrapped in textwrap.wrap(docstring, width=68 - offset)]
            commented.append(line)
        prev_offset = offset

    return '\n'.join(commented) + '\n'


def warmup(configuration, utterances, njobs=1,
           log=get_logger('pipeline', 'info')):
    """Precompile the pipeline's device programs for a corpus geometry.

    First-run compiles cost seconds to minutes per shape bucket
    (SURVEY §7 step 9: production starts cold). This entry point pays
    them up front: it derives the exact batch geometries
    ``extract_features`` would dispatch for ``utterances`` (row count
    x signal bucket, from audio headers — no decoding) and runs the
    full pipeline once over a tiny synthetic corpus with those
    geometries, compiling every program into the in-process jit cache
    and the persistent compilation cache
    (:func:`shennong_tpu.utils.enable_compilation_cache`).

    Call it at server startup — before traffic arrives — so the first
    real request runs at warm speed; on backends whose persistent
    cache replays across processes the compile cost is paid once per
    machine instead.

    A ``vtln`` section is warmed as the warped extraction path (unit
    warps): training itself compiles its own programs on first use.

    Returns a dict: the distinct ``geometries`` ([rows, samples]
    pairs), the ``programs`` count and the warmup ``seconds``.
    """
    import shutil
    import tempfile
    import time as _time

    import scipy.io.wavfile

    from shennong_tpu import utils
    from shennong_tpu.audio import Audio
    from shennong_tpu.ops.framing import bucket_size
    from shennong_tpu.parallel.stream import _scan_count, plan_batches
    from shennong_tpu.utterances import Utterances

    utils.enable_compilation_cache()
    config = init_config(configuration, log=null_logger())

    utterances = list(Utterances(utterances)
                      if not isinstance(utterances, Utterances)
                      else utterances)
    sample_rate = Audio.scan(utterances[0].audio_file).sample_rate

    # the geometries extract_features would dispatch (executor batch
    # size 64, row-sorted grouping, geometric signal buckets)
    geometries = {}
    for chunk, rows in plan_batches(utterances, batch_size=64):
        bucket = bucket_size(max(_scan_count(u) for u in chunk))
        geometries[(rows, bucket)] = True
    geometries = sorted(geometries)
    log.info(
        'warming %d pipeline geometr%s for %d utterances',
        len(geometries), 'y' if len(geometries) == 1 else 'ies',
        len(utterances))

    # synthetic corpus reproducing those geometries: equal-length
    # groups sort adjacent, so the planner re-creates each (rows,
    # bucket) batch exactly; speech-like noise keeps every program
    # numerically live (VAD finds voiced frames, pitch locks)
    with_warps = 'vtln' in config
    if with_warps:
        config = {k: v for k, v in config.items() if k != 'vtln'}
    workdir = tempfile.mkdtemp(prefix='shennong_warmup_')
    start = _time.perf_counter()
    try:
        entries = []
        rng = np.random.RandomState(0)
        for index, (rows, bucket) in enumerate(geometries):
            t = np.arange(bucket) / sample_rate
            signal = (
                np.sin(2 * np.pi * 120 * t)
                * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                + rng.randn(bucket) * 0.05)
            wav = os.path.join(workdir, f'geom{index}.wav')
            scipy.io.wavfile.write(
                wav, int(sample_rate),
                (signal / np.abs(signal).max() * 12000).astype(
                    np.int16))
            entries.extend(
                (f'warm{index}-{row}', wav, f'spk{row % 2}')
                for row in range(rows))
        synthetic = Utterances(entries)
        warps = (
            {utt.name: 1.0 for utt in synthetic} if with_warps
            else None)
        extract_features(
            config, synthetic, warps=warps, njobs=njobs,
            log=null_logger())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    seconds = _time.perf_counter() - start
    log.info('warmup done in %.1fs', seconds)
    return {
        'geometries': [list(geom) for geom in geometries],
        'programs': len(geometries),
        'seconds': round(seconds, 2)}
