"""Pallas TPU kernel: fused inference attention gate.

Fuses the whole AttentionGate inference path (reference
unet/models/layers.py:171-192) into one VMEM-resident pass per spatial
tile:

    g_up = bilinear_align_corners(g, size(x))      # as two MXU matmuls
    t    = relu(g_up @ Wg' + x @ Wx' + b)          # BN folded into W', b
    att  = sigmoid(t @ wpsi' + bpsi')              # BN folded
    out  = x * att

The XLA version materializes g_up, g1, x1 and att in HBM between fusions
(~4 extra HBM round-trips of (H, W, C)-sized tensors); here everything
after the g-row DMA stays in VMEM. BatchNorm is inference-mode
(running stats), folded into the 1x1 convs as column scales + biases —
so this kernel applies to eval/predict; training uses the XLA path
(batch stats need a global reduction).

Upsampling-as-matmul: the align-corners interpolation along W is a
constant (W, w_in) matrix (computed at trace time); along H the tile's
interpolation matrix depends on the tile row offset and is built
in-kernel from broadcasted iotas — both then run on the MXU.

Grid: (N, H // TH). g stays in HBM (ANY) and each program DMAs just the
few source rows its tile interpolates from.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_into_conv(kernel: jnp.ndarray, scale: jnp.ndarray,
                      bias: jnp.ndarray, mean: jnp.ndarray,
                      var: jnp.ndarray, eps: float = 1e-5
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into a bias-free 1x1 conv.

    y = scale*(x@W - mean)/sqrt(var+eps) + bias = x @ (W*a) + (bias - mean*a)
    where a = scale/sqrt(var+eps). kernel is (Cin, Cout)."""
    a = scale * jax.lax.rsqrt(var + eps)
    return kernel * a[None, :], bias - mean * a


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align-corners bilinear matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def _gate_kernel(g_hbm, x_ref, wg_ref, wx_ref, badd_ref, wpsi_ref,
                 bpsi_ref, interp_w_ref, out_ref, g_rows, dma_sem, *,
                 th: int, rg: int, h_in: int, h_out: int):
    n = pl.program_id(0)
    ih = pl.program_id(1)
    i0 = ih * th

    # source row window [r0, r0+rg) covering the tile's interpolation
    if h_out == 1 or h_in == 1:
        r0 = 0
    else:
        r0 = (i0 * (h_in - 1)) // (h_out - 1)
        r0 = jnp.minimum(r0, h_in - rg)
    dma = pltpu.make_async_copy(g_hbm.at[n, pl.ds(r0, rg)], g_rows,
                                dma_sem)
    dma.start()

    x = x_ref[0]                                  # (TH, W, Cx)
    # All math below is reshape/transpose-free (Mosaic rejects lane-dim
    # shape casts for small channel counts): every step is a dot_general
    # whose result dims are already in the right order.
    xx = jax.lax.dot_general(
        x, wx_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (TH, W, I)

    dma.wait()
    g = g_rows[:]                                 # (RG, w_in, Cg)

    # in-kernel H interpolation matrix (TH, RG)
    # TPU iota must be integer-typed; cast to f32 for the weight math.
    rows = (jax.lax.broadcasted_iota(jnp.int32, (th, rg), 0)
            .astype(jnp.float32) + i0.astype(jnp.float32))
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, rg), 1) \
        .astype(jnp.float32)
    if h_out == 1 or h_in == 1:
        onehot_h = (cols == 0).astype(jnp.float32)
    else:
        src = rows * (float(h_in - 1) / float(h_out - 1))
        lo = jnp.minimum(jnp.floor(src), float(h_in - 1))
        wfrac = src - lo
        rel = lo - r0.astype(jnp.float32)
        onehot_h = ((cols == rel) * (1.0 - wfrac)
                    + (cols == rel + 1.0) * wfrac)
    onehot_h = onehot_h.astype(g.dtype)

    # W interpolation: (W, w_in) x (RG, w_in, Cg) -> (W, RG, Cg)
    g_w = jax.lax.dot_general(
        interp_w_ref[:], g, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    # H interpolation: (TH, RG) x (W, RG, Cg) -> (TH, W, Cg)
    g_up = jax.lax.dot_general(
        onehot_h, g_w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)

    gg = jax.lax.dot_general(
        g_up, wg_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (TH, W, I)
    t = jnp.maximum(gg + xx + badd_ref[:][None, None, :], 0.0)
    p = jax.lax.dot_general(
        t.astype(x.dtype), wpsi_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (TH, W, 1)
    att = jax.nn.sigmoid(p + bpsi_ref[0, 0])
    out_ref[0] = x * att.astype(x.dtype)


def _pick_tile_h(h_out: int, w: int, cx: int, cg: int) -> int:
    """Largest power-of-two tile height keeping the working set ~<=6MB."""
    budget = 6 * 1024 * 1024
    per_row = w * (2 * cx + 2 * cg + cx) * 2  # x, g_up, out, intermediates
    th = h_out
    while th > 8 and th * per_row > budget:
        th //= 2
    return max(th, 8)


def fused_shapes_supported(g_shape, x_shape) -> bool:
    """Whether the Mosaic kernel supports these shapes: small spatial
    dims (init-time dummies, tiny eval images) hit unsupported vector
    shape casts — fall back to the XLA path there. The upsample ratio
    must be exactly 2x per axis: the kernel DMAs only rg = th//2 + 2
    source rows per tile, which covers the interpolation stencil for 2x
    but silently zero-weights out-of-window rows for larger ratios."""
    _, h_in, w_in, _ = g_shape
    _, h_out, w_out, _ = x_shape
    return (min(h_in, w_in) >= 16 and h_out % 8 == 0
            and w_out % 8 == 0 and w_in % 8 == 0
            and h_out == 2 * h_in and w_out == 2 * w_in)


def attention_gate_fused(g: jnp.ndarray, x: jnp.ndarray,
                         wg: jnp.ndarray, wx: jnp.ndarray,
                         badd: jnp.ndarray, wpsi: jnp.ndarray,
                         bpsi: float, *, interpret: bool = False
                         ) -> jnp.ndarray:
    """Fused inference attention gate.

    Args:
      g: gating features (N, h, w, Cg) — decoder, lower resolution
      x: skip features (N, H, W, Cx)
      wg: folded W_g (Cg, I); wx: folded W_x (Cx, I)
      badd: summed folded biases (I,)
      wpsi: folded psi weights (I, 1); bpsi: folded psi bias (scalar)
    Returns x * sigmoid(psi(relu(Wg g_up + Wx x))) like the XLA path.
    """
    n, h_in, w_in, cg = g.shape
    _, h_out, w_out, cx = x.shape
    inter = wg.shape[1]
    # Mosaic needs the g lane (channel) dim >= 128: zero-pad channels and
    # the matching wg rows (pure zeros contribute nothing to the matmul).
    if cg < 128:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 128 - cg)))
        wg = jnp.pad(wg, ((0, 128 - cg), (0, 0)))
        cg = 128
    th = _pick_tile_h(h_out, w_out, cx, cg)
    while h_out % th:
        th //= 2
    rg = min(th // 2 + 2, h_in)
    import os
    if os.environ.get('UNET_TPU_DEBUG_FUSED'):
        print(f'[fused gate] g={g.shape} x={x.shape} inter={inter} '
              f'th={th} rg={rg}', flush=True)

    interp_w = jnp.asarray(_interp_matrix(w_in, w_out), dtype=x.dtype)

    kernel = functools.partial(_gate_kernel, th=th, rg=rg, h_in=h_in,
                               h_out=h_out)
    return pl.pallas_call(
        kernel,
        grid=(n, h_out // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),              # g (HBM)
            pl.BlockSpec((1, th, w_out, cx),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),             # x tile
            pl.BlockSpec((cg, inter), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cx, inter), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((w_out, w_in), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_out, cx),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rg, w_in, cg), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g, x, wg, wx, badd, wpsi,
      jnp.asarray(bpsi, jnp.float32).reshape(1, 1), interp_w)


def attention_gate_reference(g: jnp.ndarray, x: jnp.ndarray,
                             wg: jnp.ndarray, wx: jnp.ndarray,
                             badd: jnp.ndarray, wpsi: jnp.ndarray,
                             bpsi: float) -> jnp.ndarray:
    """Pure-XLA reference of the same folded computation (golden test
    target and fallback path)."""
    from unet_tpu.ops.resize import resize_bilinear_align_corners
    g_up = resize_bilinear_align_corners(g, x.shape[1], x.shape[2])
    t = jnp.maximum(
        jnp.einsum('nhwc,ci->nhwi', g_up, wg.astype(g_up.dtype))
        + jnp.einsum('nhwc,ci->nhwi', x, wx.astype(x.dtype))
        + badd.astype(jnp.float32).astype(x.dtype), 0.0)
    p = jnp.einsum('nhwi,io->nhwo', t, wpsi.astype(t.dtype)) + bpsi
    return x * jax.nn.sigmoid(p.astype(jnp.float32)).astype(x.dtype)
