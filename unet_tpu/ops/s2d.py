"""Width-axis space-to-depth 3x3 convolution — the C=64 MXU-fill fix.

Why this exists (measured, docs/DESIGN.md "Train-step profile"): on TPU
the channel dim maps to the 128-wide lane axis. The U-Net's 512^2 and
256^2 levels run convs with C=64 (ref unet/models/layers.py:31-38 at
base_features=64), which fills HALF the MXU's K and N dims — XLA tops
out at ~35 TFLOP/s there vs 88-111 TFLOP/s for the C>=128 levels. No
kernel fixes that (the r2 Pallas implicit-GEMM only tied XLA); it needs
a LAYOUT change.

The trick: a 3x3/stride-1 conv on (H, W, C) is exactly expressible on
the width-space-to-depth layout (H, W/2, 2C), where the channel dim is
[phase-0 | phase-1] = even/odd logical columns. In NHWC row-major the
s2d transform is a pure ``reshape`` — W and C are adjacent minor dims —
so no data movement is introduced, only a (possibly fused) relayout.

Derivation: y[i, 2j+b] = sum_{dy,dx} w[dy,dx] . x[i+dy, 2j+b+dx].
Writing 2j+b+dx = 2(j+s)+q with q=(b+dx) mod 2, s=floor((b+dx)/2), each
logical tap (b, dx) lands at a distinct (col-tap s, in-phase q) slot, so
the whole conv is ONE dense 3x3 conv in s2d space with a structured-
zero kernel K[(1+dy), (1+s), qC+c, bCo+co] = w[1+dy, 1+dx, c, co].
Union of col supports is s in {-1,0,1}: 'SAME' padding in s2d space is
correct because every kernel slot that would touch the out-of-range
logical column (-2 / W+1) is structurally zero.

Cost model: the dense s2d kernel has 18 of 36 (dy, s, q)-slots per
out-phase populated -> 2x the logical FLOPs, but run at the >=128-lane
MXU rate (~2.9x the C=64 rate) -> net ~1.4-1.5x. The 'split' variant
below cuts overhead to 1.33x (two (3,2)-tap convs, one per out-phase,
each with a fully-used 2-col window) at the price of Cout=Co lane fill.
Both are golden-tested against lax.conv; the winner is chosen by
measurement (benchmarks/s2d_bench.py).

STATUS — measured negative result, ships OPT-IN (UNET_TPU_S2D=1).
Per-op (v5e, b8, bf16, chained scan): 512^2 64->64 fwd 4.83->4.15 ms
(dense), fwd+dx+dk 5.83->5.11 ms (split); a conv-BN-ReLU pair block
8.03->5.73 ms. End-to-end in the full AttentionUNet: train step
116.3 -> 138.8 ms, infer 206 -> 164 slices/s — a clear LOSS. The
mechanism (benchmarks/s2d_level_bench.py + the model measurement): the
chained microbenches overstate the win because adjacent d2s/s2d
reshapes CANCEL across scan iterations, so the chain runs entirely in
s2d layout and never pays a boundary; in the real model every routed
conv borders logical-layout ops (maxpool, mm-resize, attention gates),
and each s2d<->logical relayout of a (8,512,512,64) bf16 map costs
~1-2 ms (logical C=64 tensors are 2x lane-padded in HBM, so the copy
moves ~0.75 GB). Eight boundaries eat the ~3 ms of per-conv wins
several times over. A future attempt must keep an ENTIRE level
(convs + BN + ReLU + pool + gate consumers) in s2d space so boundaries
amortize to ~one per level; with only 4 eligible convs the projected
ceiling is ~3-5 ms/step, which did not justify the surgery this round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ('NHWC', 'HWIO', 'NHWC')


def s2d_w(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W/2, 2C); channel = q*C + c for logical
    column 2j+q. Pure reshape (W, C are adjacent minor dims)."""
    n, h, w, c = x.shape
    assert w % 2 == 0, w
    return x.reshape(n, h, w // 2, 2 * c)


def d2s_w(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d_w`."""
    n, h, w2, c2 = y.shape
    assert c2 % 2 == 0, c2
    return y.reshape(n, h, w2 * 2, c2 // 2)


def s2d_kernel_w(k: jnp.ndarray) -> jnp.ndarray:
    """Lift a logical (3, 3, C, Co) kernel to the dense s2d kernel
    (3, 3, 2C, 2Co) (structured zeros; see module docstring)."""
    kh, kw, c, co = k.shape
    assert (kh, kw) == (3, 3), k.shape
    out = jnp.zeros((3, 3, 2 * c, 2 * co), k.dtype)
    for b in range(2):
        for dx in (-1, 0, 1):
            q = (b + dx) % 2
            v = (b + dx) // 2 + 1
            out = out.at[:, v, q * c:(q + 1) * c,
                         b * co:(b + 1) * co].set(k[:, dx + 1])
    return out


def s2d_profitable(w: int, cin: int, cout: int) -> bool:
    """Static (trace-time) gate: route this logical 3x3 conv through the
    width-s2d layout? True only where measured faster on TPU
    (benchmarks/s2d_bench.py; numbers in docs/DESIGN.md). The caller is
    responsible for the backend check (TPU only) and any env override.

    Measured (v5e, b8, bf16, min-of-3 chained scan): the win exists ONLY
    for square 64->64 convs — XLA runs them at 32 TFLOP/s while its
    mixed-channel big convs (128->64 etc.) already hit 95+, where the
    s2d layout's 2x (dense) / 1.33x (split) FLOP overhead loses. 32->32
    also loses (the s2d FLOP overhead exceeds the fill gain at that
    size). 512^2 64->64: fwd 4.83->4.15 ms (dense), fwd+dx+dk
    5.83->5.11 ms (split); 256^2 64->64: fwd 1.84->1.50 (dense),
    fwd+dx+dk 2.14->1.77 (split).
    """
    return w % 2 == 0 and w >= 256 and cin == 64 and cout == 64


def s2d_variant(train: bool) -> str:
    """Measured variant choice: 'split' (1.33x FLOPs, Cout-lane fill)
    wins once the weight gradient is in the program; 'dense' (2x FLOPs,
    full fill) wins forward-only inference."""
    return 'split' if train else 'dense'


def conv3x3_s2d_raw(xs: jnp.ndarray, k: jnp.ndarray,
                    variant: str = 'dense') -> jnp.ndarray:
    """3x3/stride-1/SAME conv, s2d layout in -> s2d layout out.

    xs: (N, H, W/2, 2C) width-s2d input; k: the LOGICAL (3, 3, C, Co)
    kernel. Returns (N, H, W/2, 2Co) with the s2d channel convention
    (out-phase blocks [b=0 | b=1]). No boundary reshapes — this is the
    building block for keeping an entire encoder level resident in s2d
    layout (one relayout per level, not per conv).
    """
    k = k.astype(xs.dtype)
    if variant == 'dense':
        return jax.lax.conv_general_dilated(
            xs, s2d_kernel_w(k), (1, 1), 'SAME', dimension_numbers=_DN)
    if variant == 'split':
        c, co = k.shape[2], k.shape[3]
        ka = jnp.zeros((3, 2, 2 * c, co), k.dtype)   # out-phase b=0
        kb = jnp.zeros((3, 2, 2 * c, co), k.dtype)   # out-phase b=1
        # b=0: dx=-1 -> (q=1, u=0); dx=0 -> (q=0, u=1); dx=1 -> (q=1, u=1)
        ka = ka.at[:, 0, c:].set(k[:, 0])
        ka = ka.at[:, 1, :c].set(k[:, 1])
        ka = ka.at[:, 1, c:].set(k[:, 2])
        # b=1: dx=-1 -> (q=0, u=0); dx=0 -> (q=1, u=0); dx=1 -> (q=0, u=1)
        kb = kb.at[:, 0, :c].set(k[:, 0])
        kb = kb.at[:, 0, c:].set(k[:, 1])
        kb = kb.at[:, 1, :c].set(k[:, 2])
        ya = jax.lax.conv_general_dilated(
            xs, ka, (1, 1), ((1, 1), (1, 0)), dimension_numbers=_DN)
        yb = jax.lax.conv_general_dilated(
            xs, kb, (1, 1), ((1, 1), (0, 1)), dimension_numbers=_DN)
        return jnp.concatenate([ya, yb], axis=-1)
    raise ValueError(f'unknown variant: {variant}')


def conv3x3_s2d_w(x: jnp.ndarray, k: jnp.ndarray,
                  variant: str = 'dense') -> jnp.ndarray:
    """3x3/stride-1/SAME conv computed in width-s2d layout.

    x: (N, H, W, C) with W even; k: (3, 3, C, Co) (any float dtype —
    cast to x.dtype like flax nn.Conv). Returns (N, H, W, Co), equal to
    ``lax.conv_general_dilated(x, k, (1,1), 'SAME')`` up to summation
    order.
    """
    return d2s_w(conv3x3_s2d_raw(s2d_w(x), k, variant))


def _s2d_pool_phases(xs: jnp.ndarray):
    """The four 2x2-window elements of a logical max pool, viewed in s2d
    layout: column phases are CHANNEL halves (lane-aligned slices — no
    strided W gather), row phases are stride-2 H slices. Row-major
    window order (matches ops/pool.py `_phases` and torch argmax ties):
    (r, 2j) (r, 2j+1) (r+1, 2j) (r+1, 2j+1).
    """
    c = xs.shape[-1] // 2
    return (xs[:, 0::2, :, :c], xs[:, 0::2, :, c:],
            xs[:, 1::2, :, :c], xs[:, 1::2, :, c:])


@jax.custom_vjp
def max_pool_s2d_exit(xs: jnp.ndarray) -> jnp.ndarray:
    """Logical 2x2/stride-2 max pool of an s2d-layout map, emitting the
    LOGICAL pooled tensor: (N, H, W/2, 2C) -> (N, H/2, W/2, C).

    The s2d exit is free here: pooling adjacent logical columns is an
    elementwise max over the two phase channel-halves, and the result's
    width is already W/2. H must be even. Tie gradients route to the
    first maximal window element in row-major order (same rule as
    select_and_scatter / ops/pool.py).
    """
    e00, e01, e10, e11 = _s2d_pool_phases(xs)
    return jnp.maximum(jnp.maximum(e00, e01), jnp.maximum(e10, e11))


def _mps_fwd(xs):
    y = max_pool_s2d_exit(xs)
    return y, (xs, y)


def _mps_bwd(res, g):
    xs, y = res
    e00, e01, e10, e11 = _s2d_pool_phases(xs)
    m00 = e00 == y
    m01 = (e01 == y) & ~m00
    m10 = (e10 == y) & ~m00 & ~m01
    m11 = (e11 == y) & ~m00 & ~m01 & ~m10
    z = g.dtype.type(0)
    r0 = jnp.concatenate([jnp.where(m00, g, z), jnp.where(m01, g, z)], -1)
    r1 = jnp.concatenate([jnp.where(m10, g, z), jnp.where(m11, g, z)], -1)
    n, h2, w2, c2 = r0.shape
    dxs = jnp.stack([r0, r1], axis=2).reshape(n, 2 * h2, w2, c2)
    return (dxs,)


max_pool_s2d_exit.defvjp(_mps_fwd, _mps_bwd)
