"""Pallas TPU kernel: fused bilinear(image)+nearest(mask) warp gather.

Why this exists: the augmentation pipeline composes every geometric
transform (flips/affine/elastic/grid — reference
unet/data/augmentations.py:56-89) into ONE sampling grid and pays a
single gather (`unet_tpu/data/augmentations.py:_grid_sample_fused`).
On this TPU, XLA lowers that gather to a per-index descriptor loop
(~11 ns/index — measured, docs/DESIGN.md), so the 8.4M-index warp of a
32-image 512² super-batch costs ~190 ms and keeps the aug-on train CLI
at ~49 slices/s vs the 67.9 aug-off device ceiling.

The kernel exploits the warp's spatial coherence instead: for one
output row-block, the source rows live in a narrow band (rotation ≤15°
spreads ±sin15°·W/2 rows across the block; elastic/grid add a bounded
wobble). So:

  * the WHOLE source image + mask stay resident in VMEM (2×1 MB at
    512²) — gathers become VMEM-local addressing, not HBM descriptors;
  * per (8, W) output block, the source-row window [lo, hi] is computed
    from the coords on the VPU, and only 8-row chunks intersecting the
    window are touched (a `lax.cond` skips the rest — worst case
    degrades to the full image, stays correct);
  * within a chunk, each source row is broadcast across the block and
    sampled with `tpu.dynamic_gather` (a native per-sublane lane
    permute, via `jnp.take_along_axis` on a 2D block) at the c0 and
    c0+1 columns; row hits (r0 == k, r0+1 == k) select into the four
    bilinear taps and four mask corner taps.

The arithmetic reproduces `_grid_sample_fused` operation-for-operation
(same clamping, same f32 multiply/add order, same round-half-even
nearest-mask tie rule). Masks come out bit-identical; image values
agree to <=2 f32 ULP (Mosaic and XLA make different FMA/reassociation
choices in the 4-tap lerp). Golden-tested in tests/test_pallas_warp.py,
including borders and .5 ties.

Augmentation runs outside `grad`, so no custom VJP is needed.

Shape support: C == 1 (the CT pipeline), H % 8 == 0, W % 128 == 0.
Off-TPU (and in tests) the kernel runs in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 8  # output rows per block (one f32 sublane tile)


def _take_lane(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sublane gather along lanes: out[s, l] = x[s, idx[s, l]].

    Lowers to one `tpu.dynamic_gather` (Mosaic's supported
    `take_along_axis` form). Indices must be in-bounds.
    """
    return jnp.take_along_axis(x, idx, axis=1, mode='promise_in_bounds')


def _take_lane_tiled(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Tiled form for W > 128: decompose the (8, W) gather into (W/128)²
    single-vreg tile gathers + selects. Same result, ~(W/128)x the
    gather ops — and the ONLY form Mosaic compiles beyond one vreg:
    `tpu.dynamic_gather` on a vector<8x512xf32> fails with
    "Not implemented: Multiple source vregs along gather dimension"
    (measured on v5e libtpu, r4), so this is the default whenever
    W > 128. UNET_TPU_WARP_TILED_GATHER=1/0 forces it on/off."""
    br, w = x.shape
    outs = []
    for o in range(w // 128):
        io = idx[:, o * 128:(o + 1) * 128]
        acc = jnp.zeros((br, 128), x.dtype)
        for t in range(w // 128):
            rel = io - t * 128
            g = jnp.take_along_axis(x[:, t * 128:(t + 1) * 128],
                                    jnp.clip(rel, 0, 127), axis=1,
                                    mode='promise_in_bounds')
            acc = jnp.where((rel >= 0) & (rel < 128), g, acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _warp_body(img_ref, msk_ref, rows_ref, cols_ref, oimg_ref, omsk_ref,
               *, h: int, w: int, tiled_gather: bool):
    gather = _take_lane_tiled if tiled_gather else _take_lane

    r = rows_ref[0]                                   # (BR, w) f32
    c = cols_ref[0]
    valid = (r >= 0) & (r <= h - 1) & (c >= 0) & (c <= w - 1)
    rc = jnp.clip(r, 0.0, h - 1.0)
    cc = jnp.clip(c, 0.0, w - 1.0)
    r0 = jnp.minimum(jnp.floor(rc).astype(jnp.int32), h - 2)
    c0 = jnp.minimum(jnp.floor(cc).astype(jnp.int32), w - 2)
    # identical expression to _grid_sample_fused: f32 minus int promotes
    wr = rc - r0
    wc = cc - c0
    c1 = c0 + 1

    # source-row window of this block (r0 is clamped, so in [0, h-2])
    lo = jnp.min(r0)
    hi = jnp.max(r0) + 1

    zero = jnp.zeros((BR, w), jnp.float32)
    # bilinear taps t__ and mask corner taps u__; every output pixel's
    # r0/r0+1 row falls in [lo, hi], so each tap is written exactly once
    carry0 = (zero,) * 8

    def chunk(kb, acc):
        def hit():
            irows = img_ref[0, pl.ds(kb * 8, 8), :]   # (8, w)
            mrows = msk_ref[0, pl.ds(kb * 8, 8), :]
            t00, t01, t10, t11, u00, u01, u10, u11 = acc
            for s in range(8):
                k_abs = kb * 8 + s
                irow = jnp.broadcast_to(irows[s:s + 1, :], (BR, w))
                mrow = jnp.broadcast_to(mrows[s:s + 1, :], (BR, w))
                g0 = gather(irow, c0)
                g1 = gather(irow, c1)
                m0 = gather(mrow, c0)
                m1 = gather(mrow, c1)
                hit0 = r0 == k_abs
                hit1 = r0 + 1 == k_abs
                t00 = jnp.where(hit0, g0, t00)
                t01 = jnp.where(hit0, g1, t01)
                t10 = jnp.where(hit1, g0, t10)
                t11 = jnp.where(hit1, g1, t11)
                u00 = jnp.where(hit0, m0, u00)
                u01 = jnp.where(hit0, m1, u01)
                u10 = jnp.where(hit1, m0, u10)
                u11 = jnp.where(hit1, m1, u11)
            return t00, t01, t10, t11, u00, u01, u10, u11

        touched = (kb * 8 + 7 >= lo) & (kb * 8 <= hi)
        return jax.lax.cond(touched, hit, lambda: acc)

    t00, t01, t10, t11, u00, u01, u10, u11 = jax.lax.fori_loop(
        0, h // 8, chunk, carry0)

    # same multiply/add association as _grid_sample_fused => bit-equal
    img = (t00 * (1 - wr) * (1 - wc)
           + t01 * (1 - wr) * wc
           + t10 * wr * (1 - wc)
           + t11 * wr * wc)
    img = img * valid.astype(img.dtype)

    ri = (wr > 0.5) | ((wr == 0.5) & (r0 % 2 == 1))
    ci = (wc > 0.5) | ((wc == 0.5) & (c0 % 2 == 1))
    ma = jnp.where(ri, u10, u00)
    mb = jnp.where(ri, u11, u01)
    m = jnp.where(ci, mb, ma)
    m = jnp.where(valid, m, 0.0).astype(jnp.int32)

    oimg_ref[0] = img
    omsk_ref[0] = m


def warp_supported(images: jnp.ndarray) -> bool:
    """Static shape gate: C == 1 CT slices, tile-aligned H/W."""
    n, h, w, c = images.shape
    return c == 1 and h % BR == 0 and w % 128 == 0 and h >= 2 and w >= 128


def _warp_pallas(img2: jnp.ndarray, mskf: jnp.ndarray,
                 rows: jnp.ndarray, cols: jnp.ndarray, *, tiled: bool):
    """The raw pallas_call on (N, H, W) f32 planes (local shapes)."""
    n, h, w = img2.shape
    return pl.pallas_call(
        functools.partial(_warp_body, h=h, w=w, tiled_gather=tiled),
        grid=(n, h // BR),
        in_specs=[
            # full image/mask planes resident in VMEM per grid step; the
            # block index is constant in b, so Pallas only re-fetches
            # when the image index changes
            pl.BlockSpec((1, h, w), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, w), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, w), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR, w), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, w), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        ],
        interpret=jax.default_backend() != 'tpu',
    )(img2, mskf, rows, cols)


def _batch_only_sharding(mesh, arg_shapes):
    """NamedSharding keeping only the batch-dim axes of operand 0's
    sharding (H/W replicated — the kernel owns whole rows/planes)."""
    from jax.sharding import NamedSharding, PartitionSpec
    spec = getattr(arg_shapes[0].sharding, 'spec', None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(mesh, PartitionSpec(batch))


@functools.lru_cache(maxsize=None)
def _warp_cp(tiled: bool):
    """``custom_partitioning`` wrapper: a pallas_call is an opaque
    custom call to the SPMD partitioner, so without this a
    batch-sharded caller (the data-parallel train CLI's sharded
    augmentation) would silently all-gather the super-batch and run the
    FULL global warp replicated on every chip. The kernel is
    embarrassingly parallel over images, so we declare batch-dim
    partitioning (H/W replicated) and lower to the same pallas_call on
    the local shard — per-image results are unchanged, so the sharded
    program stays bit-identical to single-device (tested on the
    8-device CPU mesh in tests/test_pallas_warp.py)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def fn(img2, mskf, rows, cols):
        return _warp_pallas(img2, mskf, rows, cols, tiled=tiled)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        ns = _batch_only_sharding(mesh, arg_shapes)
        return (ns, ns)

    def partition(mesh, arg_shapes, result_shape):
        ns = _batch_only_sharding(mesh, arg_shapes)

        def lower_fn(img2, mskf, rows, cols):
            return _warp_pallas(img2, mskf, rows, cols, tiled=tiled)

        return mesh, lower_fn, (ns, ns), (ns, ns, ns, ns)

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        # Shardy form of the same contract: n is free, h/w/images'
        # pixels must be replicated
        sharding_rule='n h w, n h w, n h w, n h w -> n h w, n h w',
        need_replication_factors=('h', 'w'))
    return cp


def grid_sample_fused_pallas(images: jnp.ndarray, masks: jnp.ndarray,
                             rows: jnp.ndarray, cols: jnp.ndarray):
    """Drop-in replacement for augmentations._grid_sample_fused
    (bit-identical outputs): images (N, H, W, 1) f32, masks (N, H, W)
    int, rows/cols (N, H, W) f32 source coords."""
    n, h, w, _ = images.shape
    img2 = images[..., 0]
    mskf = masks.astype(jnp.float32)
    from unet_tpu.core.setup import env_flag
    tiled = env_flag('UNET_TPU_WARP_TILED_GATHER', w > 128)
    out_img, out_msk = _warp_cp(tiled)(img2, mskf, rows, cols)
    return out_img[..., None], out_msk.astype(masks.dtype)
