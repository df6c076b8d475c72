"""Weight-conversion proof and cross-framework check for CREPE.

Two independent pieces of evidence that the JAX CREPE is the keras
CREPE:

1. the shipped ``model-tiny.npz`` is tensor-for-tensor identical to a
   fresh conversion of the reference keras checkpoint (read directly
   with h5py);
2. a from-scratch torch re-implementation of the network (TF-style
   asymmetric SAME padding, inference batch-norm) produces the same
   activations as the jitted JAX forward, on random frames and on the
   real recording.
"""

import os

import numpy as np
import pytest

from shennong_tpu.models import crepe

REFERENCE_H5 = '/root/reference/shennong/share/crepe/model-tiny.h5'
SHIPPED_NPZ = os.path.join(
    os.path.abspath(crepe.SHARE_DIR), 'model-tiny.npz')


@pytest.mark.skipif(
    not os.path.isfile(REFERENCE_H5),
    reason='reference keras checkpoint not available')
def test_h5_conversion_identity():
    """The shipped npz equals a fresh conversion of the keras h5."""
    fresh = crepe.convert_keras_h5(REFERENCE_H5)
    assert crepe.capacity_of(fresh) == 'tiny'
    with np.load(SHIPPED_NPZ) as shipped:
        assert sorted(shipped.files) == sorted(fresh.keys())
        for key in fresh:
            assert np.array_equal(shipped[key], fresh[key]), key


def _torch_forward(params, frames):
    """Independent torch re-implementation of the CREPE forward."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(frames)[:, None, :]  # [N, C=1, T]
    for i in range(1, 7):
        kernel = torch.from_numpy(
            np.asarray(params[f'conv{i}/kernel']))  # [W, Cin, Cout]
        weight = kernel.permute(2, 1, 0)  # torch conv1d [Cout, Cin, W]
        stride = crepe._LAYER_STRIDES[i - 1]
        ksize = kernel.shape[0]

        # TF-style SAME padding: pad to ceil(T/stride) outputs, extra
        # sample on the right when the total padding is odd
        t_in = x.shape[-1]
        t_out = -(-t_in // stride)
        total = max((t_out - 1) * stride + ksize - t_in, 0)
        x = F.pad(x, (total // 2, total - total // 2))

        x = F.conv1d(x, weight, torch.from_numpy(
            np.asarray(params[f'conv{i}/bias'])), stride=stride)
        x = F.relu(x)

        mean = torch.from_numpy(np.asarray(params[f'conv{i}/mean']))
        var = torch.from_numpy(np.asarray(params[f'conv{i}/var']))
        gamma = torch.from_numpy(np.asarray(params[f'conv{i}/gamma']))
        beta = torch.from_numpy(np.asarray(params[f'conv{i}/beta']))
        x = ((x - mean[:, None]) / torch.sqrt(var[:, None] + 1e-3)
             * gamma[:, None] + beta[:, None])

        x = F.max_pool1d(x, 2)

    # keras flattens [N, T, C]; torch tensor is [N, C, T]
    x = x.permute(0, 2, 1).reshape(x.shape[0], -1)
    kernel = torch.from_numpy(np.asarray(params['classifier/kernel']))
    bias = torch.from_numpy(np.asarray(params['classifier/bias']))
    return torch.sigmoid(x @ kernel + bias).numpy()


def test_torch_cross_forward_random():
    params = {k: np.asarray(v)
              for k, v in crepe.load_params('tiny').items()}
    rng = np.random.RandomState(0)
    frames = rng.randn(8, 1024).astype(np.float32)
    frames -= frames.mean(axis=1, keepdims=True)
    frames /= frames.std(axis=1, keepdims=True)

    import jax.numpy as jnp
    ours = np.asarray(crepe.forward(
        crepe.load_params('tiny'), jnp.asarray(frames)))
    theirs = _torch_forward(params, frames)
    assert ours.shape == theirs.shape == (8, 360)
    assert np.max(np.abs(ours - theirs)) < 1e-5


def test_torch_cross_forward_real(real_audio):
    from shennong_tpu.processor.pitch_crepe import CrepePitchProcessor

    proc = CrepePitchProcessor(model_capacity='tiny')
    frames = proc._model_frames(real_audio.data)
    assert frames.shape[0] == 142  # centered 1.42 s at 10 ms hop

    import jax.numpy as jnp
    ours = np.asarray(crepe.forward(
        crepe.load_params('tiny'), jnp.asarray(frames)))
    params = {k: np.asarray(v)
              for k, v in crepe.load_params('tiny').items()}
    theirs = _torch_forward(params, frames)
    assert np.max(np.abs(ours - theirs)) < 1e-5

    # and the processor's padded-bucket path returns the same thing
    via_proc = proc._forward(frames)
    assert np.max(np.abs(via_proc - ours)) < 1e-6


def test_convert_other_capacity_synthetic(tmp_path):
    # the converter + forward plumbing works for every capacity, not
    # just the shipped 'tiny': build a keras-layout checkpoint for
    # 'small' (multiplier 8) with random tensors, convert it, and run
    # the CNN forward at the expected widths
    import h5py
    import jax.numpy as jnp
    from shennong_tpu.models import crepe

    mult = crepe.CAPACITY_MULTIPLIER['small']
    filters = [f * mult for f in crepe._LAYER_FILTERS]
    widths = crepe._LAYER_WIDTHS
    rng = np.random.RandomState(0)

    path = str(tmp_path / 'model-small.h5')
    with h5py.File(path, 'w') as fh:
        cin = 1
        for i in range(1, 7):
            cout = filters[i - 1]
            conv = fh.create_group(f'conv{i}').create_group('layer')
            conv['kernel:0'] = (
                rng.randn(widths[i - 1], 1, cin, cout) * 0.05)
            conv['bias:0'] = rng.randn(cout) * 0.01
            bn = fh.create_group(f'conv{i}-BN').create_group('layer')
            bn['gamma:0'] = np.ones(cout)
            bn['beta:0'] = np.zeros(cout)
            bn['moving_mean:0'] = rng.randn(cout) * 0.01
            bn['moving_variance:0'] = np.ones(cout)
            cin = cout
        clf = fh.create_group('classifier').create_group('layer')
        clf['kernel:0'] = rng.randn(4 * filters[-1], 360) * 0.01
        clf['bias:0'] = np.zeros(360)

    params = crepe.convert_keras_h5(path)
    assert crepe.capacity_of(params) == 'small'
    assert params['conv1/kernel'].shape == (512, 1, filters[0])

    frames = rng.randn(3, 1024).astype(np.float32)
    out = np.asarray(crepe.forward(
        {k: jnp.asarray(v) for k, v in params.items()}, frames))
    assert out.shape == (3, 360)
    assert np.all((out >= 0) & (out <= 1))
