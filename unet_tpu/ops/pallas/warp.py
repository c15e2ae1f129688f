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


def _warp_body_banded2d(img_ref, msk_ref, rows_ref, cols_ref, oimg_ref,
                        omsk_ref, *, h: int, w: int):
    """2D-banded variant (the r5 rework of the tiled form): the output
    block is processed per 128-lane GROUP, and each group carries its
    own source-ROW window *and* source-column-TILE window.

    Why per group: the default body's row window spans the whole (8, w)
    block, so a 15° rotation smears it over ~w·sin15° source rows and
    ~w/8·sin15° chunks; restricted to 128 output lanes the smear is
    128·sin15° ≈ 33 rows. Likewise a lane group's c0 spans ~128·cos θ +
    wobble columns — 2 of the w/128 column tiles, not all of them. Both
    windows are exact (min/max of the group's clamped r0/c0; c1 = c0+1
    folded into the hi bound), so skipped (chunk, tile) pairs provably
    contribute nothing: masks stay bit-identical to the unwindowed
    tiled form and images agree to the usual <=2 f32 ULP contraction
    freedom (golden-locked in tests/test_pallas_warp.py).

    The `lax.cond`s sit at (group, chunk) and (group, chunk, tile)
    granularity — OUTSIDE the 8-row tap loop — because Mosaic runs the
    straight-line gather/select chain near VPU issue rate and per-row
    branching destroys that pipelining (a per-row-cond variant was
    measured 1.75x SLOWER than no windowing at all; docs/DESIGN.md).

    Mask taps collapse to ONE gather: the nearest-neighbor row/col
    choice (round-half-even on wr/wc — identical expressions to
    `_grid_sample_fused`) is resolved to integer source coords
    (rn, cn) up front, so each source row contributes `msk[rn, cn]`
    directly instead of four corner taps + selects — 3 dynamic_gathers
    per source row instead of 4, and 2 fewer select chains.
    """
    r = rows_ref[0]                                   # (BR, w) f32
    c = cols_ref[0]
    valid = (r >= 0) & (r <= h - 1) & (c >= 0) & (c <= w - 1)
    rc = jnp.clip(r, 0.0, h - 1.0)
    cc = jnp.clip(c, 0.0, w - 1.0)
    r0 = jnp.minimum(jnp.floor(rc).astype(jnp.int32), h - 2)
    c0 = jnp.minimum(jnp.floor(cc).astype(jnp.int32), w - 2)
    wr = rc - r0                                      # f32 - int promotes
    wc = cc - c0
    # nearest-neighbor mask source coords, same tie rule as the XLA path
    ri = (wr > 0.5) | ((wr == 0.5) & (r0 % 2 == 1))
    ci = (wc > 0.5) | ((wc == 0.5) & (c0 % 2 == 1))
    rn = r0 + ri.astype(jnp.int32)                    # in [0, h-1]
    cn = c0 + ci.astype(jnp.int32)                    # in [0, w-1]
    nt = w // 128

    for o in range(nt):
        sl = slice(o * 128, (o + 1) * 128)
        r0o, i0 = r0[:, sl], c0[:, sl]
        i1 = i0 + 1
        rno, ino = rn[:, sl], cn[:, sl]
        lo = jnp.min(r0o)
        hi = jnp.max(r0o) + 1                         # covers r0+1 and rn
        lot = jnp.min(i0) // 128
        hit_t = (jnp.max(i0) + 1) // 128              # covers c1 and cn
        zero = jnp.zeros((BR, 128), jnp.float32)
        carry0 = (zero,) * 5                          # t00 t01 t10 t11 m

        def chunk(kb, acc, r0o=r0o, i0=i0, i1=i1, rno=rno, ino=ino,
                  lot=lot, hit_t=hit_t):
            irows = img_ref[0, pl.ds(kb * 8, 8), :]   # (8, w)
            mrows = msk_ref[0, pl.ds(kb * 8, 8), :]
            # row-hit compares are tile-invariant: once per chunk
            hits = []
            for s in range(8):
                k_abs = kb * 8 + s
                hits.append((r0o == k_abs, r0o + 1 == k_abs,
                             rno == k_abs))
            for t in range(nt):
                def col_hit(a, t=t):
                    srci = irows[:, t * 128:(t + 1) * 128]
                    srcm = mrows[:, t * 128:(t + 1) * 128]
                    # index arithmetic is row-invariant: once per tile
                    rel0 = i0 - t * 128
                    rel1 = i1 - t * 128
                    reln = ino - t * 128
                    q0 = jnp.clip(rel0, 0, 127)
                    q1 = jnp.clip(rel1, 0, 127)
                    qn = jnp.clip(reln, 0, 127)
                    h0 = (rel0 >= 0) & (rel0 < 128)
                    h1 = (rel1 >= 0) & (rel1 < 128)
                    hn = (reln >= 0) & (reln < 128)
                    t00, t01, t10, t11, m = a
                    for s in range(8):
                        si = jnp.broadcast_to(srci[s:s + 1, :],
                                              (BR, 128))
                        sm = jnp.broadcast_to(srcm[s:s + 1, :],
                                              (BR, 128))
                        g0 = _take_lane(si, q0)
                        g1 = _take_lane(si, q1)
                        gm = _take_lane(sm, qn)
                        hit0, hit1, hitn = hits[s]
                        t00 = jnp.where(hit0 & h0, g0, t00)
                        t01 = jnp.where(hit0 & h1, g1, t01)
                        t10 = jnp.where(hit1 & h0, g0, t10)
                        t11 = jnp.where(hit1 & h1, g1, t11)
                        m = jnp.where(hitn & hn, gm, m)
                    return t00, t01, t10, t11, m

                acc = jax.lax.cond((t >= lot) & (t <= hit_t),
                                   col_hit, lambda a: a, acc)
            return acc

        # dynamic-bounds loop over ONLY the touched chunks: the group's
        # source rows live in [lo, hi], i.e. chunks [lo//8, hi//8] —
        # ~4-5 of the h/8 for the real augmentation program — so the
        # h/8-iteration loop with a per-chunk skip cond is replaced by
        # a short data-dependent while loop with no dead iterations.
        t00, t01, t10, t11, m = jax.lax.fori_loop(
            lo // 8, hi // 8 + 1, chunk, carry0)

        wro, wco = wr[:, sl], wc[:, sl]
        vo = valid[:, sl]
        # same multiply/add association as _grid_sample_fused
        img = (t00 * (1 - wro) * (1 - wco)
               + t01 * (1 - wro) * wco
               + t10 * wro * (1 - wco)
               + t11 * wro * wco)
        oimg_ref[0, :, sl] = img * vo.astype(img.dtype)
        omsk_ref[0, :, sl] = jnp.where(vo, m, 0.0).astype(jnp.int32)


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
                 rows: jnp.ndarray, cols: jnp.ndarray, *, tiled: bool,
                 banded2d: bool):
    """The raw pallas_call on (N, H, W) f32 planes (local shapes)."""
    n, h, w = img2.shape
    body = (functools.partial(_warp_body_banded2d, h=h, w=w) if banded2d
            else functools.partial(_warp_body, h=h, w=w,
                                   tiled_gather=tiled))
    return pl.pallas_call(
        body,
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
def _warp_cp(tiled: bool, banded2d: bool):
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
        return _warp_pallas(img2, mskf, rows, cols, tiled=tiled,
                            banded2d=banded2d)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        ns = _batch_only_sharding(mesh, arg_shapes)
        return (ns, ns)

    def partition(mesh, arg_shapes, result_shape):
        ns = _batch_only_sharding(mesh, arg_shapes)

        def lower_fn(img2, mskf, rows, cols):
            return _warp_pallas(img2, mskf, rows, cols, tiled=tiled,
                                banded2d=banded2d)

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
    # 2D-banded body: per-lane-group row+column-tile windows (exact,
    # bit-identical to the tiled form; see _warp_body_banded2d).
    # Default-on wherever tiling applies — measured r5 on TPU.
    # UNET_TPU_WARP_BAND2D=0 ablates back to the unwindowed tiled body.
    banded2d = tiled and env_flag('UNET_TPU_WARP_BAND2D', True)
    out_img, out_msk = _warp_cp(tiled, banded2d)(img2, mskf, rows, cols)
    return out_img[..., None], out_msk.astype(masks.dtype)
