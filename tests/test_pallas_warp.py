"""Golden tests: the Pallas banded warp kernel vs the XLA fused warp
(`augmentations._grid_sample_fused`) — same clamping, same tap
selection, same round-half-even nearest-mask ties.

Exactness contract: MASKS (the labels) are bit-identical. IMAGE values
agree to <=2 f32 ULP: the two sides go through different compilers
(Mosaic vs XLA) which make different FMA/reassociation choices in the
final 4-tap lerp; the op sequence is the same, the contraction freedom
is not controllable from the source level. Runs in interpret mode
off-TPU, so these goldens hold anywhere.
"""

import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.data.augmentations import (AugmentConfig, _grid_sample_fused,
                                         augment_batch)
from unet_tpu.ops.pallas.warp import grid_sample_fused_pallas, warp_supported

H, W = 32, 128  # smallest supported tile-aligned plane (keeps interpret fast)


def _case(name, n=2, h=H, w=W):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    img = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    msk = jnp.asarray((rng.random((n, h, w)) > 0.7).astype(np.int32))
    return rng, img, msk


def _assert_ulp_close(got, want, max_ulp=2):
    got, want = np.asarray(got), np.asarray(want)
    assert got.dtype == want.dtype == np.float32
    ulp = np.abs(got.view(np.int32).astype(np.int64)
                 - want.view(np.int32).astype(np.int64))
    # int32-bitpattern distance == ULP distance for same-sign floats;
    # mismatched signs only occur at 0.0 vs -0.0 (distance huge), so
    # also accept exact-value equality
    ok = (ulp <= max_ulp) | (got == want)
    assert ok.all(), (
        f'{(~ok).sum()} px beyond {max_ulp} ULP; worst '
        f'{ulp[~ok].max() if (~ok).any() else 0}')


def _check(img, msk, rows, cols):
    want_i, want_m = _grid_sample_fused(img, msk, rows, cols)
    got_i, got_m = grid_sample_fused_pallas(img, msk, rows, cols)
    _assert_ulp_close(got_i, want_i)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_random_scattered_coords():
    """Arbitrary (incoherent) coords incl. out-of-range: exercises the
    zero border and a worst-case full-image row window."""
    rng, img, msk = _case('scatter')
    rows = jnp.asarray(rng.uniform(-6, H + 6, (2, H, W)), jnp.float32)
    cols = jnp.asarray(rng.uniform(-6, W + 6, (2, H, W)), jnp.float32)
    _check(img, msk, rows, cols)


def test_identity_and_shift():
    rng, img, msk = _case('ident')
    rr = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None],
                          (2, H, W))
    cc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, None, :],
                          (2, H, W))
    _check(img, msk, rr, cc)                       # identity
    _check(img, msk, rr + 3.25, cc - 7.5)          # subpixel shift + ties


def test_rotation_like_coherent_warp():
    """A realistic coherent warp (rotation + smooth wobble), the case
    the banded window is designed for."""
    rng, img, msk = _case('rot')
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None] - (H - 1) / 2
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :] - (W - 1) / 2
    a = jnp.asarray([0.26, -0.26])[:, None, None]  # ±15°
    rows = (jnp.cos(a) * yy + jnp.sin(a) * xx) + (H - 1) / 2 \
        + jnp.asarray(rng.normal(0, 0.7, (2, H, W)), jnp.float32)
    cols = (-jnp.sin(a) * yy + jnp.cos(a) * xx) + (W - 1) / 2 \
        + jnp.asarray(rng.normal(0, 0.7, (2, H, W)), jnp.float32)
    _check(img, msk, rows, cols)


def test_exact_half_ties_round_half_even():
    """frac == 0.5 everywhere: the nearest-mask tie rule must pick the
    even neighbor exactly like the fused path."""
    _, img, msk = _case('ties')
    rr = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None],
                          (2, H, W)) + 0.5
    cc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, None, :],
                          (2, H, W)) + 0.5
    _check(img, msk, rr, cc)


def test_tiled_gather_fallback(monkeypatch):
    monkeypatch.setenv('UNET_TPU_WARP_TILED_GATHER', '1')
    rng, img, msk = _case('tiled')
    rows = jnp.asarray(rng.uniform(-2, H + 2, (2, H, W)), jnp.float32)
    cols = jnp.asarray(rng.uniform(-2, W + 2, (2, H, W)), jnp.float32)
    _check(img, msk, rows, cols)


def test_banded2d_body(monkeypatch):
    """The r5 2D-banded body (default whenever tiling is on) must stay
    bit-identical to BOTH the unwindowed tiled form and the XLA
    reference, including worst-case scattered coords where every lane
    group's windows degrade to the full range, at a width (256) that
    actually has multiple column tiles."""
    w = 256
    rng, img, msk = _case('colwin', h=16, w=w)
    for name, span in (('coherent', 20.0), ('scattered', None)):
        if span is None:
            rows = jnp.asarray(rng.uniform(-4, 16 + 4, (2, 16, w)),
                               jnp.float32)
            cols = jnp.asarray(rng.uniform(-4, w + 4, (2, 16, w)),
                               jnp.float32)
        else:
            # bounded displacement, like the real augmentation program
            rr = jnp.broadcast_to(
                jnp.arange(16, dtype=jnp.float32)[None, :, None],
                (2, 16, w))
            cc = jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.float32)[None, None, :],
                (2, 16, w))
            rows = rr + jnp.asarray(
                rng.uniform(-span, span, (2, 16, w)), jnp.float32)
            cols = cc + jnp.asarray(
                rng.uniform(-span, span, (2, 16, w)), jnp.float32)
        monkeypatch.setenv('UNET_TPU_WARP_BAND2D', '0')
        plain_i, plain_m = grid_sample_fused_pallas(img, msk, rows, cols)
        monkeypatch.setenv('UNET_TPU_WARP_BAND2D', '1')
        win_i, win_m = grid_sample_fused_pallas(img, msk, rows, cols)
        # windowed vs unwindowed: same taps minus provably-dead ones.
        # MASKS are bit-identical (integer selects); images carry the
        # usual <=2 ULP compiler-contraction freedom in the final lerp
        # (the two bodies compile as different graphs)
        _assert_ulp_close(np.asarray(win_i)[..., 0],
                          np.asarray(plain_i)[..., 0])
        np.testing.assert_array_equal(np.asarray(win_m),
                                      np.asarray(plain_m), err_msg=name)
        # and both match the XLA fused warp under the usual contract
        _check(img, msk, rows, cols)


def test_warp_supported_gate():
    assert warp_supported(jnp.zeros((1, 32, 128, 1)))
    assert not warp_supported(jnp.zeros((1, 32, 64, 1)))   # W % 128
    assert not warp_supported(jnp.zeros((1, 33, 128, 1)))  # H % 8
    assert not warp_supported(jnp.zeros((1, 32, 128, 3)))  # C != 1


def test_batch_sharded_partitioning():
    """Under a data-sharded mesh the kernel must (a) keep the outputs
    batch-sharded — a pallas_call is an opaque custom call to the SPMD
    partitioner, so without the custom_partitioning rule GSPMD would
    all-gather the batch and run the full warp replicated on every
    device — and (b) stay bit-identical to the unsharded call."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    rng, img, msk = _case('sharded', n=8)
    rows = jnp.asarray(rng.uniform(-2, H + 2, (8, H, W)), jnp.float32)
    cols = jnp.asarray(rng.uniform(-2, W + 2, (8, H, W)), jnp.float32)
    want_i, want_m = jax.jit(grid_sample_fused_pallas)(img, msk, rows, cols)

    mesh = Mesh(np.array(jax.devices()), ('data',))
    sh = NamedSharding(mesh, P('data'))
    args = [jax.device_put(a, sh) for a in (img, msk, rows, cols)]
    got_i, got_m = jax.jit(grid_sample_fused_pallas)(*args)
    assert got_i.sharding.spec == P('data'), got_i.sharding
    assert got_m.sharding.spec == P('data'), got_m.sharding
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_augment_batch_wiring_bit_equal(monkeypatch):
    """End-to-end augment_batch with the kernel enabled must equal the
    XLA path bit-for-bit (same key => same sampled transforms)."""
    rng, img, msk = _case('wiring', n=4)
    key = jax.random.key(123)
    cfg = AugmentConfig()
    # call the unjitted function: the env gate is read at trace time, so
    # going through the jitted wrapper would reuse the cached jaxpr and
    # silently compare the XLA path against itself
    raw = augment_batch.__wrapped__
    want_i, want_m = raw(img, msk, key, cfg)
    monkeypatch.setenv('UNET_TPU_PALLAS_WARP', '1')
    got_i, got_m = raw(img, msk, key, cfg)
    # the warp's <=2-ULP slack on [0,1] values (~1.2e-7) passes through
    # the elementwise photometric ops scaled by at most contrast*1/std
    # (<=1.15*2), i.e. bounded ABSOLUTE error — normalization shifts
    # values near 0, so a relative/ULP bound is the wrong metric here
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=0, atol=3e-7)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
