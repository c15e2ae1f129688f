"""Golden tests for the implicit-GEMM Pallas conv (ops/pallas/conv3x3).

Interpret mode on CPU (tests/conftest.py forces the CPU backend): the
kernel's math — tap-packed GEMM, halo DMA windows, channel padding, the
custom VJP, and the fused BN+ReLU epilogue — checked against
`lax.conv_general_dilated` on the exact level shapes the U-Net uses
(scaled down spatially; channel counts real).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_tpu.ops.pallas.conv3x3 import (
    conv3x3, conv3x3_bn_relu, conv3x3_reference, fold_bn_scale_shift,
    igemm_shapes_supported)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


# channel transitions the model actually performs (ref unet.py:50-62),
# at reduced spatial size (the kernel tiles rows identically).
LEVEL_SHAPES = [
    (2, 16, 128, 64, 64),     # encoder conv2 at level 0
    (1, 8, 128, 64, 128),     # down1 conv1
    (1, 8, 128, 128, 128),    # down1 conv2
    (1, 8, 128, 128, 64),     # up4 conv1 (concat'd input)
    (1, 8, 128, 256, 128),    # up3 conv1
]


@pytest.mark.parametrize('n,h,w,ci,co', LEVEL_SHAPES)
def test_forward_matches_xla(n, h, w, ci, co):
    rng = np.random.default_rng(0)
    x = _rand(rng, n, h, w, ci)
    k = _rand(rng, 3, 3, ci, co) * 0.1
    assert igemm_shapes_supported(x.shape, k.shape)
    y = conv3x3(x, k, True)
    yr = conv3x3_reference(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=1e-4, rtol=1e-4)


def test_forward_bf16():
    rng = np.random.default_rng(1)
    x = _rand(rng, 1, 16, 128, 64).astype(jnp.bfloat16)
    k = _rand(rng, 3, 3, 64, 64) * 0.1
    y = conv3x3(x, k, True)
    yr = conv3x3_reference(x, k)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32),
        atol=0.15, rtol=0.1)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    x = _rand(rng, 1, 16, 128, 64)
    k = _rand(rng, 3, 3, 64, 64) * 0.1

    def loss_pallas(x, k):
        return jnp.sum(jnp.sin(conv3x3(x, k, True)))

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(conv3x3_reference(x, k)))

    gx, gk = jax.grad(loss_pallas, (0, 1))(x, k)
    gxr, gkr = jax.grad(loss_ref, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gkr), atol=1e-3)


def test_fused_bn_relu_epilogue():
    rng = np.random.default_rng(3)
    x = _rand(rng, 1, 8, 128, 64)
    k = _rand(rng, 3, 3, 64, 64) * 0.1
    scale = _rand(rng, 64) * 0.1 + 1.0
    bias = _rand(rng, 64) * 0.1
    mean = _rand(rng, 64) * 0.1
    var = jnp.abs(_rand(rng, 64)) + 0.5
    mul, add = fold_bn_scale_shift(scale, bias, mean, var)
    y = conv3x3_bn_relu(x, k, mul, add, interpret=True)
    yr = jnp.maximum(conv3x3_reference(x, k) * mul + add, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)


def test_unsupported_shapes_rejected():
    # stem (1->64), logits head, odd widths, sub-64 channels
    assert not igemm_shapes_supported((1, 8, 128, 1), (3, 3, 1, 64))
    assert not igemm_shapes_supported((1, 8, 128, 64), (3, 3, 64, 2))
    assert not igemm_shapes_supported((1, 8, 100, 64), (3, 3, 64, 64))
    assert not igemm_shapes_supported((1, 8, 128, 32), (3, 3, 32, 64))
    assert not igemm_shapes_supported((1, 8, 128, 64), (1, 1, 64, 64))


def test_guard_accounts_for_itemsize():
    """The VMEM-budget guard must use the caller's real dtype width:
    a shape that fits in bf16 tiles may not fit in f32 tiles, and the
    guard's answer must match what _pick_tile_h gives the kernel."""
    from unet_tpu.ops.pallas.conv3x3 import _pick_tile_h

    shape, k = (8, 512, 512, 64), (3, 3, 64, 128)
    for itemsize in (2, 4):
        guard = igemm_shapes_supported(shape, k, itemsize=itemsize)
        th = _pick_tile_h(shape[1], shape[2], k[2], k[3], itemsize)
        assert guard == (th > 0), (itemsize, guard, th)
