"""Pallas TPU kernel: implicit-GEMM 3x3 convolution (stride 1, SAME).

The hot ops of the U-Net are the 3x3 convs (reference
unet/models/layers.py:31-38); at the 512^2 / C=64 level XLA's conv only
reaches ~35 TFLOP/s on v5e because the K=64 contraction and the N=64
output-channel dim each fill only half of the 128x128 MXU. This kernel
re-tiles the convolution as one *tap-packed* GEMM per row tile:

  K packs the 3 vertical taps:    pv[r, w, (dy, c)] = xpad[r+dy, w, c]
  N packs the 3 horizontal taps:  Wall[(dy, c), (dx, co)] = w[dy, dx, c, co]
  z = pv @ Wall                   # (TH, W+2, 3*Co), K = 3*C, N = 3*Co
  out[r, w] = sum_dx z[r, w+dx, dx-th block]

The GEMM does exactly 9*C*Co MACs per output pixel — no redundant work —
with K = N = 3*C: 384 for C=128 (perfect MXU alignment) and 192 for
C=64 (75% per-axis fill, still ~1.6x better than XLA's K=N=64). The
three dy-shifted adds land on leading-dim slices of z, which are free
address arithmetic in Mosaic; the dx packing is a lane-dim concat done
once per tile in VMEM.

Row tiles DMA from HBM with a +2-row halo, double-buffered so the copy
of tile i+1 overlaps the GEMM of tile i. The output block write is
pipelined by Pallas itself.

An optional fused epilogue applies a per-channel affine + ReLU
(inference BatchNorm folded via `fold_bn_scale_shift`), saving the
separate HBM round trip XLA would spend on BN+ReLU after an opaque
custom call.

`conv3x3` wraps the kernel with a custom VJP so it can serve the
training path: the data gradient is the same kernel with a
spatially-flipped, channel-transposed kernel; the weight gradient stays
an XLA convolution (its GEMM shape — K = pixels, M = 9*Cin, N = Cout —
is already MXU-friendly there).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_scale_shift(scale: jnp.ndarray, bias: jnp.ndarray,
                        mean: jnp.ndarray, var: jnp.ndarray,
                        eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference BN as y = conv_out * mul + add (per channel, f32)."""
    mul = scale * jax.lax.rsqrt(var + eps)
    return mul, bias - mean * mul


def _conv_body(x_hbm, w_ref, mul_ref, add_ref, out_ref, xbuf, sem, *,
               th: int, w: int, wp: int, cin: int, cout: int,
               n_tiles: int, n_imgs: int, relu: bool, out_dtype):
    # NOTE: xbuf's lane dim may be zero-padded to 128 (manual DMAs need
    # 128-aligned lane extents); the [0:cin] slices below drop the pad
    # so the GEMM contraction stays at K = 3*cin.
    n = pl.program_id(0)
    i = pl.program_id(1)
    step = n * n_tiles + i

    def start(slot, nn, ii):
        pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(ii * th, th + 2)], xbuf.at[slot],
            sem.at[slot]).start()

    @pl.when(step == 0)
    def _():
        start(0, n, i)

    # prefetch the next tile while this one computes
    nxt = step + 1
    @pl.when(nxt < n_imgs * n_tiles)
    def _():
        start(nxt % 2, nxt // n_tiles, nxt % n_tiles)

    pltpu.make_async_copy(x_hbm.at[0, pl.ds(0, th + 2)],
                          xbuf.at[step % 2], sem.at[step % 2]).wait()
    s0 = step % 2
    cp = max(cin, 128)

    # One K=cp dot per VERTICAL tap, accumulated in f32: the dy slices
    # land on the leading (untiled) dim, so they are pure address
    # arithmetic — no relayouts, no masked loads. The N dim packs the
    # 3 horizontal taps (3*cout), which are unpacked by the shifted adds
    # below. For cin < 128 the K dim carries the DMA's zero pad lanes
    # against zero kernel rows (lane-sliced K=cin loads measured slower
    # than the wasted MACs).
    dn = (((2,), (0,)), ((), ()))
    if cout >= 128:
        # Unpacked N: cout alone fills the MXU columns; keeping z at
        # (TH, WP, cout) instead of 3*cout shrinks the f32 live set 3x,
        # which buys larger row tiles.
        acc = None
        for dx in range(3):
            zx = None
            for dy in range(3):
                zd = jax.lax.dot_general(
                    xbuf[s0, dy:th + dy],
                    w_ref[pl.ds(dy * cp, cp), pl.ds(dx * cout, cout)],
                    dn, preferred_element_type=jnp.float32)
                zx = zd if zx is None else zx + zd        # (TH, WP, Co)
            part = zx[:, dx:w + dx, :]
            acc = part if acc is None else acc + part
    else:
        z = None
        for d in range(3):
            zd = jax.lax.dot_general(
                xbuf[s0, d:th + d], w_ref[pl.ds(d * cp, cp)],
                dn, preferred_element_type=jnp.float32)   # (TH, WP, 3Co)
            z = zd if z is None else z + zd
        # N-unpack the horizontal taps
        acc = (z[:, 0:w, 0:cout] + z[:, 1:w + 1, cout:2 * cout]
               + z[:, 2:w + 2, 2 * cout:3 * cout])
    if mul_ref is not None:
        acc = acc * mul_ref[:][None, None, :] + add_ref[:][None, None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)


def _pick_tile_h(h: int, w: int, cin: int, cout: int,
                 bytes_in: int) -> int:
    """Largest tile height (multiple of 8, divides h) with the working
    set — 2x double-buffered input, ph, f32 z, 2x pipelined output —
    inside a ~10MB VMEM budget."""
    import os
    forced = os.environ.get('UNET_TPU_CONV_TH')
    if forced:
        return int(forced) if h % int(forced) == 0 else 0
    budget = 13 * 1024 * 1024
    for th in (64, 32, 16, 8):
        if h % th:
            continue
        wp = -(-(w + 2) // 8) * 8
        zco = cout if cout >= 128 else 3 * cout
        need = (2 * (th + 2) * wp * max(cin, 128) * bytes_in  # xbuf
                + 2 * th * wp * zco * 4                      # z + zd (f32)
                + 3 * max(cin, 128) * 3 * cout * bytes_in    # Wall
                + 2 * th * w * cout * bytes_in)              # out x2
        if need <= budget:
            return th
    return 0


def igemm_shapes_supported(x_shape, k_shape, itemsize: int = 2) -> bool:
    """Shapes this kernel handles: 3x3 stride-1 SAME convs with MXU-able
    channel counts and row-tileable spatial dims. Cin/Cout below 64
    (e.g. the 1->64 stem or logits heads) stay on XLA — their lane dims
    are too narrow to pack. ``itemsize`` is the input dtype's byte width
    (2 = bf16 default; pass 4 for f32 — the VMEM tile budget differs, so
    the guard must use the same bytes the kernel will)."""
    if len(k_shape) != 4 or tuple(k_shape[:2]) != (3, 3):
        return False
    _, h, w, cin = x_shape
    cout = k_shape[3]
    if k_shape[2] != cin:
        return False
    if cin < 64 or cout < 64 or cin % 64 or cout % 64:
        return False
    if w % 128 or h % 8:
        return False
    # The custom VJP's data-gradient runs the same kernel with Cin/Cout
    # swapped: an asymmetric channel pair near the VMEM budget edge must
    # fail the guard unless BOTH orientations tile.
    return (_pick_tile_h(h, w, cin, cout, itemsize) > 0
            and _pick_tile_h(h, w, cout, cin, itemsize) > 0)


def _conv3x3_pallas(x: jnp.ndarray, k: jnp.ndarray,
                    mul: Optional[jnp.ndarray],
                    add: Optional[jnp.ndarray],
                    relu: bool, interpret: bool) -> jnp.ndarray:
    n, h, w, cin = x.shape
    cout = k.shape[3]
    th = _pick_tile_h(h, w, cin, cout, x.dtype.itemsize)
    assert th, (x.shape, k.shape)

    # DMA slice sizes on tiled dims must be 8-aligned: pad W+2 up to a
    # multiple of 8 (the right-pad columns multiply zero weights of taps
    # that never reach them, so they are inert).
    wp = -(-(w + 2) // 8) * 8
    # Manual DMAs need 128-aligned lane extents; physical HBM storage is
    # 128-lane padded regardless, and this pad fuses into the halo pad
    # (and, mid-network, into the producer's BN/ReLU fusion), so it
    # costs no extra HBM pass.
    cp = max(cin, 128)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cp - cin)))
    # Wall[(dy, c_padded), (dx, co)] — zero rows for the DMA pad lanes
    wall = k.astype(x.dtype).transpose(0, 2, 1, 3)        # (3, cin, 3, cout)
    if cp != cin:
        wall = jnp.pad(wall, ((0, 0), (0, cp - cin), (0, 0), (0, 0)))
    wall = wall.reshape(3 * cp, 3 * cout)

    n_tiles = h // th
    body = functools.partial(
        _conv_body, th=th, w=w, wp=wp, cin=cin, cout=cout,
        n_tiles=n_tiles, n_imgs=n, relu=relu, out_dtype=x.dtype)
    with_affine = mul is not None
    if with_affine:
        def kern(x_hbm, w_ref, mul_ref, add_ref, out_ref, xbuf, sem):
            body(x_hbm, w_ref, mul_ref, add_ref, out_ref, xbuf, sem)
    else:
        def kern(x_hbm, w_ref, out_ref, xbuf, sem):
            body(x_hbm, w_ref, None, None, out_ref, xbuf, sem)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),                 # xpad (HBM)
        pl.BlockSpec((3 * cp, 3 * cout), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),                # Wall
    ]
    args = [xpad, wall]
    if with_affine:
        in_specs += [
            pl.BlockSpec((cout,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
        ]
        args += [mul.astype(jnp.float32), add.astype(jnp.float32)]

    return pl.pallas_call(
        kern,
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


def conv3x3_reference(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA same-semantics conv (golden-test target and fallback)."""
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x: jnp.ndarray, k: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """3x3 / stride-1 / SAME conv via the tap-packed Pallas GEMM, with a
    custom VJP so the training path can use it too. k is (3, 3, Cin, Cout)
    (f32 params; cast to x.dtype inside, matching flax nn.Conv)."""
    return _conv3x3_pallas(x, k, None, None, False, interpret)


def _conv3x3_fwd(x, k, interpret):
    return conv3x3(x, k, interpret), (x, k)


def _conv3x3_bwd(interpret, res, g):
    x, k = res
    # dx: conv of g with the rot180, channel-transposed kernel — the same
    # Pallas kernel (Cout/Cin swap keeps shapes supported).
    kt = k[::-1, ::-1].transpose(0, 1, 3, 2)
    # Defensive: callers are expected to consult igemm_shapes_supported
    # (which now checks both orientations), but if the transposed shape
    # still fails to tile (e.g. a forced UNET_TPU_CONV_TH), fall back to
    # XLA instead of tripping the in-trace assert.
    if _pick_tile_h(g.shape[1], g.shape[2], kt.shape[2], kt.shape[3],
                    g.dtype.itemsize) > 0:
        dx = _conv3x3_pallas(g, kt.astype(g.dtype), None, None, False,
                             interpret).astype(x.dtype)
    else:
        dx = conv3x3_reference(g, kt).astype(x.dtype)
    # dk: correlation over the batch+spatial dims; XLA's grad conv is
    # already MXU-shaped (K = N*H*W pixels), keep it there.
    dk = jax.vjp(lambda kk: conv3x3_reference(x, kk), k)[1](g)[0]
    return dx, dk


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_bn_relu(x: jnp.ndarray, k: jnp.ndarray, mul: jnp.ndarray,
                    add: jnp.ndarray, *, relu: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Inference-path fusion: relu(conv(x, k) * mul + add) in one pass
    (mul/add from `fold_bn_scale_shift`). No VJP — eval only."""
    return _conv3x3_pallas(x, k, mul, add, relu, interpret)
