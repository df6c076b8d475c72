"""Additional pipeline integration tests: crepe pitch, VTLN-in-config,
bottleneck features"""

import numpy as np
import pytest

from shennong_tpu import Utterances
from shennong_tpu.pipeline import extract_features, get_default_config


@pytest.fixture(scope='module')
def utterances(wav_file):
    return Utterances([
        ('utt1', wav_file, 'spk1', 0.0, 0.7),
        ('utt2', wav_file, 'spk2', 0.7, 1.4)])


def test_crepe_pitch_pipeline(utterances):
    config = get_default_config('mfcc', with_pitch='crepe')
    config['mfcc']['dither'] = 0
    config['model_capacity'] = None  # not a valid key
    del config['model_capacity']
    # the default config mirrors the reference default ('full'); only
    # tiny weights ship in-repo, so the test selects them explicitly
    assert config['pitch']['model_capacity'] == 'full'
    config['pitch']['model_capacity'] = 'tiny'
    features = extract_features(config, utterances)
    # 13 mfcc + 3 crepe pitch features
    assert features['utt1'].ndims == 16
    assert np.all(np.isfinite(features['utt1'].data))


def test_vtln_in_pipeline(utterances):
    config = get_default_config('mfcc', with_vtln='full')
    config['mfcc']['dither'] = 0
    # shrink the VTLN training for test speed
    config['vtln']['num_iters'] = 1
    config['vtln']['min_warp'] = 0.95
    config['vtln']['max_warp'] = 1.05
    config['vtln']['warp_step'] = 0.05
    config['vtln']['subsample'] = 3
    config['vtln']['ubm'] = {
        'num_gauss': 4, 'num_iters': 1, 'num_iters_init': 2,
        'num_frames': 1000}

    features = extract_features(config, utterances)
    assert features['utt1'].ndims == 13
    warp = features['utt1'].properties['mfcc']['vtln_warp']
    assert 0.95 <= warp <= 1.05


def test_bottleneck_pipeline(utterances, tmp_path_factory):
    # synthetic bottleneck weights (see test_bottleneck)
    import shennong_tpu.processor.bottleneck as bn_module
    from shennong_tpu.processor.bottleneck import BottleneckProcessor

    rng = np.random.RandomState(0)
    hidden = 60
    params = {
        'context': np.int64(5),
        'input_mean': rng.randn(144) * 0.1,
        'input_std': np.abs(rng.randn(144)) * 0.5 + 0.5,
        'bn_mean': rng.randn(400) * 0.1,
        'bn_std': np.abs(rng.randn(400)) * 0.5 + 0.5,
    }
    for name, (nin, nout) in {
            'W1': (144, hidden), 'W2': (hidden, hidden),
            'W3': (hidden, 80), 'W5': (400, hidden),
            'W6': (hidden, hidden), 'W7': (hidden, hidden),
            'W8': (hidden, 80)}.items():
        params[name] = (
            rng.randn(nin, nout) / np.sqrt(nin)).astype(np.float32)
        params['b' + name[1:]] = (
            rng.randn(nout) * 0.1).astype(np.float32)

    directory = tmp_path_factory.mktemp('bn_weights')
    np.savez(str(directory / (
        'Babel-ML17_FBANK_HL1500_SBN80_PhnStates3096.npz')), **params)

    old = bn_module._SHARE_DIR
    bn_module._SHARE_DIR = str(directory)
    BottleneckProcessor._loaded_weights.clear()
    try:
        config = get_default_config('bottleneck')
        features = extract_features(config, utterances)
        assert features['utt1'].ndims == 80
        assert np.all(np.isfinite(features['utt1'].data))
    finally:
        bn_module._SHARE_DIR = old
        BottleneckProcessor._loaded_weights.clear()
