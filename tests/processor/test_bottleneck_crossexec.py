"""Bottleneck parity against the reference's own executable code.

The reference bottleneck extractor is pure numpy
(``shennong/processor/bottleneck.py:117-501``: no pykaldi, no TF), so
its literal module-level functions can run here as the oracle: this
test extracts them from the reference checkout via AST, executes them
on the real 8 kHz recording with synthetic (shape-correct) weights,
and checks our implementation stage by stage and end to end — the
oracle is reference *code*, not a builder-written re-derivation.

Skipped when no reference checkout is present (the committed BUT
golden test in test_bottleneck.py stays armed for real weights).
"""

import ast
import os
import warnings

import numpy as np
import pytest

REFERENCE = '/root/reference/shennong/processor/bottleneck.py'

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref():
    """The reference module-level functions, executed from source."""
    import scipy.fftpack
    import scipy.linalg as spl

    with open(REFERENCE, 'r') as fp:
        tree = ast.parse(fp.read())
    functions = [
        node for node in tree.body
        if isinstance(node, ast.FunctionDef)]
    namespace = {
        'np': np, 'spl': spl, 'scipy': scipy, 'warnings': warnings}
    exec(  # noqa: S102 - executing the reference code as an oracle
        compile(ast.Module(body=functions, type_ignores=[]),
                REFERENCE, 'exec'),
        namespace)
    return namespace


@pytest.fixture(scope='module')
def weights(synthetic_weights_dict):
    return synthetic_weights_dict


@pytest.fixture(scope='module')
def synthetic_weights_dict():
    """Shape-correct random weights in the BUT npz layout."""
    rng = np.random.RandomState(42)
    hidden = 90

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
    return params


def _reference_forward(ref, signal, weights, log):
    """The reference's literal process() orchestration
    (``shennong/processor/bottleneck.py:670-764``), dither=0."""
    with warnings.catch_warnings():
        # reference VAD globally escalates warnings; keep it scoped
        frame_length, frame_noverlap = 200, 120

        vad = ref['_compute_vad'](
            signal, log, win_length=frame_length,
            win_overlap=frame_noverlap)
        assert vad.sum() > 0

        dithered = ref['_add_dither'](signal, 0.0)
        window = np.hamming(frame_length)
        fbank_mx = ref['_mel_fbank_mx'](
            window.size, 8000, numchans=24, lofreq=64.0, hifreq=3800.0)
        fea = ref['_fbank_htk'](
            dithered, window, frame_noverlap, fbank_mx)
        fea -= np.mean(fea[vad], axis=0)

        left_ctx = right_ctx = 15
        fea = np.r_[np.repeat(fea[[0]], left_ctx, axis=0),
                    fea,
                    np.repeat(fea[[-1]], right_ctx, axis=0)]

        context = int(weights['context'])
        nn_input = ref['_preprocess_nn_input'](fea, context, context)
        nn_output = np.vstack(ref['_create_nn_extract_st_BN'](
            nn_input, weights, 2)[0])
    return vad, fea, nn_input, nn_output


def test_crossexec_stages_and_end_to_end(ref, weights, real_audio_8k):
    """Our stages against the executing reference code on real 8 kHz
    speech."""
    from shennong_tpu.logger import null_logger
    from shennong_tpu.models import bottleneck as bn

    signal = real_audio_8k.data
    assert real_audio_8k.sample_rate == 8000
    assert signal.dtype == np.int16

    log = null_logger()
    ref_vad, ref_fea, ref_nn_input, ref_out = _reference_forward(
        ref, signal, weights, log)

    # stage 1: VAD decisions must be identical
    our_vad = bn.compute_vad(
        signal, log, win_length=200, win_overlap=120)
    np.testing.assert_array_equal(our_vad.astype(bool), ref_vad)

    # stage 2: network input (fbank + voiced mean norm + context DCT)
    import jax.numpy as jnp
    window_vec = np.hamming(200).astype(np.float32)
    bank = bn.mel_filterbank_htk(
        200, 8000, num_chans=24, low_freq=64.0, high_freq=3800.0)
    frames = bn.frame_signal(signal.astype(np.float32), 200, 80)
    our_fea = np.asarray(bn.fbank_htk(
        jnp.asarray(frames), jnp.asarray(window_vec),
        jnp.asarray(bank), 256))
    our_fea = our_fea - our_fea[our_vad.astype(bool)].mean(axis=0)
    our_fea = np.concatenate([
        np.repeat(our_fea[:1], 15, axis=0), our_fea,
        np.repeat(our_fea[-1:], 15, axis=0)], axis=0)
    assert our_fea.shape == ref_fea.shape
    assert np.max(np.abs(our_fea - ref_fea)) < 1e-3

    our_nn_input = bn.preprocess_nn_input(
        our_fea.astype(np.float32), int(weights['context']))
    assert our_nn_input.shape == ref_nn_input.shape
    assert np.max(np.abs(our_nn_input - ref_nn_input)) < 1e-3

    # stage 3: the stacked network alone, on the REFERENCE's input
    # (isolates float32-vs-float64 of the front end from the MLP)
    params = {
        k: jnp.asarray(v) for k, v in weights.items()
        if k != 'context'}
    our_net = np.asarray(bn.stacked_bn_forward(
        params, jnp.asarray(ref_nn_input, dtype=jnp.float32)))
    assert our_net.shape == ref_out.shape
    assert np.max(np.abs(our_net - ref_out)) < 1e-4

    # end to end through the public processor
    from shennong_tpu.processor.bottleneck import BottleneckProcessor
    proc = BottleneckProcessor(weights='FisherMono', dither=0)
    proc._loaded_weights['FisherMono'] = weights
    try:
        ours = proc.process(real_audio_8k)
    finally:
        proc._loaded_weights.pop('FisherMono', None)
    assert ours.shape == ref_out.shape
    assert np.max(np.abs(ours.data - ref_out)) < 1e-3


def test_crossexec_gmm_vad_internals(ref):
    """The reference GMM-EM helpers against ours on random energies
    (same int16-overflow semantics, same updates)."""
    from shennong_tpu.models import bottleneck as bn
    from shennong_tpu.logger import null_logger

    rng = np.random.RandomState(3)
    # bimodal 'energy' pattern with silence and speech
    signal = np.concatenate([
        (rng.randn(4000) * 100).astype(np.int16),
        (rng.randn(8000) * 8000).astype(np.int16),
        (rng.randn(4000) * 100).astype(np.int16)])
    ref_vad = ref['_compute_vad'](
        signal, null_logger(), win_length=200, win_overlap=120)
    our_vad = bn.compute_vad(
        signal, null_logger(), win_length=200, win_overlap=120)
    np.testing.assert_array_equal(our_vad.astype(bool), ref_vad)
