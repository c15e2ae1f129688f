"""Golden tests: align-corners resize vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import jax.numpy as jnp

from unet_tpu.ops.resize import (
    pad_to_match,
    resize_bilinear_align_corners,
    resize_nearest,
    upsample2x_align_corners,
)

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize('in_hw,out_hw', [
    ((8, 8), (16, 16)),     # 2x upsample
    ((7, 9), (14, 18)),     # odd sizes 2x
    ((16, 16), (5, 11)),    # downsample
    ((32, 32), (512, 512)), # big upsample
    ((1, 4), (3, 8)),       # degenerate H
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode='bilinear',
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample2x_matches_torch_upsample(rng):
    x = rng.standard_normal((1, 13, 17, 4), dtype=np.float32)
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=2, mode='bilinear',
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_matches_pil_convention(rng):
    from PIL import Image
    m = (rng.random((15, 21)) > 0.5).astype(np.uint8)
    got = np.asarray(resize_nearest(jnp.asarray(m[None, :, :, None]), 8, 8))
    want = np.array(Image.fromarray(m).resize((8, 8), Image.NEAREST))
    np.testing.assert_array_equal(got[0, :, :, 0], want)


def test_pad_to_match_splits_like_torch_fpad(rng):
    x = rng.standard_normal((1, 5, 6, 2), dtype=np.float32)
    got = np.asarray(pad_to_match(jnp.asarray(x), 8, 9))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    dw, dh = 9 - 6, 8 - 5
    want = F.pad(xt, [dw // 2, dw - dw // 2, dh // 2, dh - dh // 2])
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('in_hw,out_hw', [
    ((8, 8), (16, 16)),
    ((7, 9), (14, 18)),
    ((16, 16), (5, 11)),
    ((1, 4), (3, 8)),
])
def test_mm_resize_matches_gather_fwd_and_grad(in_hw, out_hw, rng):
    """The MXU-matmul interpolation (TPU fast path, default off-TPU only
    via UNET_TPU_MM_RESIZE) must equal the gather+lerp path, gradients
    included (the matmul backward is the transposed matmul)."""
    import jax
    from unet_tpu.ops.resize import _lerp_axis, _lerp_axis_mm

    x = jnp.asarray(rng.standard_normal((2, *in_hw, 3), dtype=np.float32))
    oh, ow = out_hw
    mm = lambda v: _lerp_axis_mm(_lerp_axis_mm(v, oh, 1), ow, 2)
    ga = lambda v: _lerp_axis(_lerp_axis(v, oh, 1), ow, 2)
    np.testing.assert_allclose(np.asarray(mm(x)), np.asarray(ga(x)),
                               rtol=1e-5, atol=1e-6)
    g_mm = jax.grad(lambda v: jnp.sum(jnp.sin(mm(v))))(x)
    g_ga = jax.grad(lambda v: jnp.sum(jnp.sin(ga(v))))(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ga),
                               rtol=1e-5, atol=1e-6)


def test_mm_resize_env_override(rng, monkeypatch):
    """UNET_TPU_MM_RESIZE forces the matmul path through the public API
    (exercises the TPU code path on the CPU test backend)."""
    monkeypatch.setenv('UNET_TPU_MM_RESIZE', '1')
    x = rng.standard_normal((1, 9, 11, 2), dtype=np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 18, 22))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(18, 22), mode='bilinear',
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lerp_axis_custom_vjp_matches_autodiff(rng):
    """The gather-based custom backward must equal autodiff of the raw
    forward (which would lower to scatter-add)."""
    import jax
    from unet_tpu.ops.resize import _lerp_axis, _lerp_axis_fwd_impl

    x = jnp.asarray(rng.standard_normal((2, 9, 7, 3), dtype=np.float32))
    for axis, out in ((1, 18), (2, 14), (1, 5)):
        f_custom = lambda v: jnp.sum(jnp.sin(_lerp_axis(v, out, axis)))
        f_raw = lambda v: jnp.sum(jnp.sin(_lerp_axis_fwd_impl(v, out, axis)))
        g_custom = jax.grad(f_custom)(x)
        g_raw = jax.grad(f_raw)(x)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_raw),
                                   rtol=1e-5, atol=1e-6)


class TestMaxPool2x2:
    """Elementwise-backward pooling (unet_tpu/ops/pool.py) vs flax's
    reduce_window lowering and torch's argmax-routed gradient."""

    def test_forward_matches_flax(self, rng):
        import jax.numpy as jnp
        import flax.linen as nn
        from unet_tpu.ops.pool import max_pool_2x2
        x = jnp.asarray(rng.standard_normal((2, 16, 20, 5)), jnp.float32)
        got = max_pool_2x2(x)
        want = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_backward_matches_torch_incl_ties(self, rng):
        import jax
        import jax.numpy as jnp
        from unet_tpu.ops.pool import max_pool_2x2
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        # force exact ties inside windows to pin the tie-routing rule
        x[0, 0, 0, 0] = x[0, 0, 1, 0] = 1.5          # tie in row 0
        x[0, 2, 2, 1] = x[0, 3, 3, 1] = 2.5          # diagonal tie
        x[1, 4:6, 4:6, 2] = 0.75                     # full 4-way tie
        g_out = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

        f = lambda t: jnp.sum(max_pool_2x2(t) * jnp.asarray(g_out))
        got = np.asarray(jax.grad(f)(jnp.asarray(x)))

        xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
        y = torch.nn.functional.max_pool2d(xt, 2)
        y.backward(torch.from_numpy(g_out).permute(0, 3, 1, 2))
        want = xt.grad.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_bf16_backward_matches_flax_reduce_window(self, rng):
        """bf16 activations tie often (coarse quantization); the custom
        backward must still agree with the select_and_scatter lowering
        it replaces."""
        import jax
        import jax.numpy as jnp
        import flax.linen as nn
        from unet_tpu.ops.pool import max_pool_2x2
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.bfloat16)
        f1 = lambda t: jnp.sum(max_pool_2x2(t).astype(jnp.float32) ** 2)
        f2 = lambda t: jnp.sum(nn.max_pool(
            t, window_shape=(2, 2), strides=(2, 2)).astype(jnp.float32) ** 2)
        g1 = np.asarray(jax.grad(f1)(x), dtype=np.float32)
        g2 = np.asarray(jax.grad(f2)(x), dtype=np.float32)
        np.testing.assert_array_equal(g1, g2)
