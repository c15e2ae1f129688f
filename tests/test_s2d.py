"""Golden tests for the width-space-to-depth conv (unet_tpu/ops/s2d.py):
both variants must reproduce lax.conv exactly (up to summation order),
including through the gradient."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops.s2d import conv3x3_s2d_w, d2s_w, s2d_w


def _ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(d2s_w(s2d_w(x))),
                                  np.asarray(x))
    # channel layout: q*C + c for logical column 2j+q
    xs = s2d_w(x)
    np.testing.assert_array_equal(np.asarray(xs[:, :, 1, 3 + 2]),
                                  np.asarray(x[:, :, 3, 2]))


@pytest.mark.parametrize('variant', ['dense', 'split'])
@pytest.mark.parametrize('shape', [(2, 8, 8, 4, 6), (1, 8, 16, 3, 5),
                                   (2, 5, 12, 8, 8)])
def test_conv3x3_s2d_matches_lax_conv(variant, shape):
    n, h, w, c, co = shape
    # deterministic per-case seed (hash() is salted per interpreter run,
    # which would make any failure reproduce run-dependently)
    rng = np.random.default_rng(zlib.crc32(f'{variant}:{shape}'.encode()))
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, co)), jnp.float32)
    got = conv3x3_s2d_w(x, k, variant)
    want = _ref(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('variant', ['dense', 'split'])
def test_conv3x3_s2d_gradients(variant):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 8, 12, 6)), jnp.float32)

    def loss(f):
        return lambda xx, kk: jnp.sum(f(xx, kk) * cot)

    gx, gk = jax.grad(loss(lambda a, b: conv3x3_s2d_w(a, b, variant)),
                      argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss(_ref), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=2e-5, atol=2e-5)


def test_doubleconv_s2d_routing_matches_plain(monkeypatch):
    """DoubleConv with the s2d route forced on must match the plain path
    (same params — the kernel is lifted at apply time) for both the
    single-input and the virtual-concat pair forms."""
    from unet_tpu.models.layers import DoubleConv
    from unet_tpu.ops.s2d import s2d_profitable

    # shapes chosen to trigger the gate (w >= 256, 64->64)
    assert s2d_profitable(256, 64, 64)
    assert not s2d_profitable(128, 64, 64)      # too small spatially
    assert not s2d_profitable(256, 128, 64)     # mixed channels: XLA wins
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 32, 256, 64)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((1, 32, 256, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 32, 256, 64)), jnp.float32)

    mod = DoubleConv(64)
    monkeypatch.setenv('UNET_TPU_S2D', '0')
    params = mod.init(jax.random.key(0), x, train=False)
    params_pair = mod.init(jax.random.key(1), (a, b), train=False)
    plain = mod.apply(params, x, train=False)
    plain_pair = mod.apply(params_pair, (a, b), train=False)
    plain_tr, _ = mod.apply(params, x, train=True,
                            mutable=['batch_stats'])
    monkeypatch.setenv('UNET_TPU_S2D', '1')
    routed = mod.apply(params, x, train=False)          # dense variant
    routed_pair = mod.apply(params_pair, (a, b), train=False)
    routed_tr, _ = mod.apply(params, x, train=True,     # split variant
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(routed), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(routed_pair),
                               np.asarray(plain_pair),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(routed_tr),
                               np.asarray(plain_tr),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_s2d_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 4)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    got = conv3x3_s2d_w(x, k, 'dense').astype(jnp.float32)
    want = _ref(x, k).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
