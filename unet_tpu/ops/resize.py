"""Resize ops with PyTorch ``align_corners=True`` semantics, NHWC layout.

The reference model uses ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` and ``F.interpolate(..., align_corners=True)``
throughout (reference: unet/models/layers.py:78,183,212 and
unet/models/unet.py:206-208). ``jax.image.resize`` implements half-pixel
(align_corners=False) sampling only, so we implement align-corners sampling
directly as two separable gather+lerp passes. Index/weight tables are
computed at trace time with numpy (static shapes), so XLA sees constant
gathers that fuse with the surrounding elementwise work.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _ac_lerp_tables(in_size: int, out_size: int):
    """Index + weight tables for 1-D align-corners linear interpolation.

    Returns (idx0, idx1, w1) as numpy arrays; out[i] = in[idx0[i]]*(1-w1[i])
    + in[idx1[i]]*w1[i]. Matches torch's align_corners=True coordinate map
    ``src = i * (in_size-1)/(out_size-1)``.
    """
    if out_size == 1:
        return (np.zeros(1, np.int32), np.zeros(1, np.int32),
                np.zeros(1, np.float32))
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    idx0 = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, in_size - 1).astype(np.int32)
    w1 = (coords - idx0).astype(np.float32)
    return idx0, idx1, w1


@functools.lru_cache(maxsize=None)
def _ac_lerp_transpose_tables(in_size: int, out_size: int):
    """Transpose of the align-corners lerp as gather tables.

    The VJP of ``y[i] = (1-w[i])*x[idx0[i]] + w[i]*x[idx1[i]]`` is a
    scatter-add into x — which lowers to slow serialized scatters on
    TPU. Because the tables are static we can invert them at trace time:
    for each input index j, the (bounded) list of output indices that
    read it and their weights. The backward pass then becomes plain
    gathers: ``dx[j] = sum_k wt[j,k] * dy[oidx[j,k]]``.

    Returns (oidx (in_size, k) int32, wt (in_size, k) float32).
    """
    idx0, idx1, w1 = _ac_lerp_tables(in_size, out_size)
    contrib = [[] for _ in range(in_size)]
    for i in range(out_size):
        w = float(w1[i])
        contrib[int(idx0[i])].append((i, 1.0 - w))
        contrib[int(idx1[i])].append((i, w))
    k = max(len(c) for c in contrib)
    oidx = np.zeros((in_size, k), np.int32)
    wt = np.zeros((in_size, k), np.float32)
    for j, c in enumerate(contrib):
        for t, (i, w) in enumerate(c):
            oidx[j, t] = i
            wt[j, t] = w
    return oidx, wt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _lerp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    return _lerp_axis_fwd_impl(x, out_size, axis)


def _lerp_axis_fwd_impl(x: jnp.ndarray, out_size: int, axis: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx0, idx1, w1 = _ac_lerp_tables(in_size, out_size)
    x0 = jnp.take(x, jnp.asarray(idx0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(idx1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1, dtype=x.dtype).reshape(shape)
    return x0 + (x1 - x0) * w


def _lerp_axis_fwd(x, out_size, axis):
    return _lerp_axis_fwd_impl(x, out_size, axis), x.shape[axis]


def _lerp_axis_bwd(out_size, axis, in_size, g):
    if in_size == out_size:
        return (g,)
    oidx, wt = _ac_lerp_transpose_tables(in_size, out_size)
    k = oidx.shape[1]
    shape = [1] * g.ndim
    shape[axis] = in_size
    dx = None
    for t in range(k):
        gt = jnp.take(g, jnp.asarray(oidx[:, t]), axis=axis)
        wv = jnp.asarray(wt[:, t], dtype=g.dtype).reshape(shape)
        dx = gt * wv if dx is None else dx + gt * wv
    return (dx,)


_lerp_axis.defvjp(_lerp_axis_fwd, _lerp_axis_bwd)


@functools.lru_cache(maxsize=None)
def _ac_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """The align-corners lerp as a dense (in_size, out_size) matrix:
    ``out = x @ M`` along the axis. Two nonzeros per column."""
    idx0, idx1, w1 = _ac_lerp_tables(in_size, out_size)
    m = np.zeros((in_size, out_size), np.float32)
    cols = np.arange(out_size)
    np.add.at(m, (idx0, cols), 1.0 - w1)
    np.add.at(m, (idx1, cols), w1)
    return m


def _lerp_axis_mm(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Interpolation as an MXU matmul against the static interp matrix.

    On TPU the gather-based ``_lerp_axis`` serializes: measured 12.4 ms
    to 2x-upsample a (8, 256, 256, 64) bf16 tensor — ~20x slower than a
    memory-bound op should be — and it dominated both the decoder and
    the attention gates (fwd AND bwd). The dense matmul "wastes" MACs on
    the zero entries (the matrix is 2-nonzero-per-column banded) but
    runs on the MXU; its autodiff is just the transposed matmul, so the
    gather-transpose custom VJP is unnecessary here.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_ac_interp_matrix(in_size, out_size), x.dtype)
    y = jax.lax.dot_general(x, m, (((axis,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # dot_general appends the out dim last; move it back to `axis`
    perm = list(range(y.ndim - 1))
    perm.insert(axis, y.ndim - 1)
    return jnp.transpose(y, perm).astype(x.dtype)


def _interp_on_mxu() -> bool:
    from unet_tpu.core.setup import env_flag
    return env_flag('UNET_TPU_MM_RESIZE',
                    jax.default_backend() == 'tpu')


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """Bilinear align-corners resize of an NHWC (or NHW1/NHW) tensor.

    Equivalent to ``F.interpolate(x_nchw, (out_h, out_w), mode='bilinear',
    align_corners=True)`` modulo layout. On TPU the separable passes run
    as MXU matmuls (see ``_lerp_axis_mm``); elsewhere as gather+lerp.
    """
    lerp = _lerp_axis_mm if _interp_on_mxu() else _lerp_axis
    h_axis = 1 if x.ndim >= 3 else 0
    x = lerp(x, out_h, h_axis)
    x = lerp(x, out_w, h_axis + 1)
    return x


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear align-corners upsample of NHWC, as used by Up/AttentionUp
    (reference: unet/models/layers.py:78,212)."""
    n, h, w, c = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)


@functools.lru_cache(maxsize=None)
def _nearest_tables_pil(in_size: int, out_size: int):
    """PIL NEAREST index table (pixel-center convention):
    floor((i + 0.5) * in/out)."""
    idx = np.floor((np.arange(out_size, dtype=np.float64) + 0.5) * in_size /
                   out_size).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize (floor convention, matches PIL NEAREST as
    used for masks in reference predict.py:163 and augmentations.py:153)."""
    h_axis = 1 if x.ndim >= 3 else 0
    if x.shape[h_axis] != out_h:
        x = jnp.take(x, jnp.asarray(_nearest_tables_pil(x.shape[h_axis],
                                                        out_h)), axis=h_axis)
    if x.shape[h_axis + 1] != out_w:
        x = jnp.take(x, jnp.asarray(_nearest_tables_pil(
            x.shape[h_axis + 1], out_w)), axis=h_axis + 1)
    return x


def pad_to_match(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Zero-pad NHWC spatial dims to (target_h, target_w), splitting the
    difference like F.pad in reference layers.py:101-102 (left = diff//2)."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    if dh == 0 and dw == 0:
        return x
    return jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                       (dw // 2, dw - dw // 2), (0, 0)))
