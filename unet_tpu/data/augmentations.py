"""Batched on-device data augmentation (replaces host-side albumentations).

The reference augments each sample on CPU inside DataLoader workers with
albumentations (unet/data/augmentations.py:26-89). On TPU that design
starves the chip, so here the whole train-time pipeline runs as one jitted
batched program on device, driven by `jax.random` keys:

  Resize(img_size)                    -> host/bucketing (dataset layer)
  HorizontalFlip(p=0.5)               -> folded into the affine matrix
  VerticalFlip(p=0.3)                 -> folded into the affine matrix
  Affine(translate ±10%, scale
    0.85–1.15, rotate ±15°, p=0.5,
    border 0)                         -> inverse-map affine matrix
  ElasticTransform(alpha=50, sigma=10,
    p=0.3, border 0)                  -> smoothed displacement field
  GridDistortion(5 steps, ±0.2,
    p=0.3, border 0)                  -> piecewise-linear coordinate map
  RandomBrightnessContrast(±0.15,
    p=0.3)                            -> elementwise
  GaussNoise(std 0.01–0.02, p=0.2)    -> elementwise
  CoarseDropout(1–4 holes, 3–6%,
    fill=0, p=0.1)                    -> rectangle masks (image only)
  Normalize(mean=0.5, std=0.5)        -> elementwise

All geometric transforms compose into a SINGLE sampling grid, so each
image is gathered exactly once (bilinear, zero border) and each mask once
(nearest) — one fused pass instead of albumentations' five sequential
warps. Displacement fields are composed additively (standard small-
deformation approximation); parity with albumentations is statistical,
not bitwise (SURVEY.md §7 "hard parts").

Shapes: images (N, H, W, C) float32 in [0, 1]; masks (N, H, W) int32.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pallas_warp_requested() -> bool:
    """Gate for the Pallas banded warp kernel (ops/pallas/warp.py).
    Read at trace time. Default ON on TPU (measured r4: full aug
    193 -> 58 ms per 32-image 512² super-batch, hardware-parity-checked
    by benchmarks/warp_parity.py); off elsewhere (interpret mode is for
    tests). UNET_TPU_PALLAS_WARP=0 forces the XLA gather path, =1
    forces the kernel (interpret off-TPU)."""
    from unet_tpu.core.setup import env_flag
    import jax
    return env_flag('UNET_TPU_PALLAS_WARP',
                    jax.default_backend() == 'tpu')


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Augmentation hyperparameters (defaults = reference albumentations
    pipeline, unet/data/augmentations.py:56-89; YAML keys map as in ref
    scripts/train.py:244-249). Frozen/hashable: passed to the jitted
    pipeline as a static argument (one compile per distinct config)."""
    p_hflip: float = 0.5
    p_vflip: float = 0.3
    p_affine: float = 0.5
    translate_pct: float = 0.1
    scale_min: float = 0.85
    scale_max: float = 1.15
    rotate_deg: float = 15.0
    p_elastic: float = 0.3
    elastic_alpha: float = 50.0
    elastic_sigma: float = 10.0
    p_grid: float = 0.3
    grid_steps: int = 5
    grid_limit: float = 0.2
    p_brightness: float = 0.3
    brightness_limit: float = 0.15
    contrast_limit: float = 0.15
    p_noise: float = 0.2
    noise_std_min: float = 0.01
    noise_std_max: float = 0.02
    p_dropout: float = 0.1
    dropout_holes_max: int = 4
    hole_frac_min: float = 0.03
    hole_frac_max: float = 0.06
    mean: float = 0.5
    std: float = 0.5

    def replace(self, **kw) -> 'AugmentConfig':
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_yaml(cls, aug_cfg: Optional[dict]) -> 'AugmentConfig':
        """Map the reference YAML augmentation section (configs/
        lung_tumor.yaml:46-51) onto this config."""
        aug_cfg = aug_cfg or {}
        return cls(
            p_hflip=aug_cfg.get('horizontal_flip', 0.5),
            rotate_deg=float(aug_cfg.get('rotation_limit', 15)),
            p_elastic=aug_cfg.get('elastic', 0.3),
            p_brightness=aug_cfg.get('brightness_contrast', 0.3),
            # extension keys (absent from the reference YAML — their
            # pipeline hardcodes these probabilities, augmentations.py:
            # 56-89; exposing them lets a config reproduce the
            # reference's *fallback* transform set (hflip only) exactly,
            # used by the torch-control parity run, docs/parity_r3/)
            p_vflip=aug_cfg.get('vertical_flip', 0.3),
            p_affine=aug_cfg.get('affine', 0.5),
            p_grid=aug_cfg.get('grid_distortion', 0.3),
            p_noise=aug_cfg.get('gauss_noise', 0.2),
            p_dropout=aug_cfg.get('coarse_dropout', 0.1),
        )


def _bernoulli(key: Array, p, n: int) -> Array:
    return (jax.random.uniform(key, (n,)) < p).astype(jnp.float32)


def _uniform(key: Array, lo, hi, shape) -> Array:
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _affine_matrices(key: Array, cfg: AugmentConfig, n: int,
                     h: int, w: int) -> Array:
    """Per-sample inverse affine maps as (N, 2, 3) matrices acting on
    (row, col, 1) output coords -> source coords, centered on the image
    center. Flips are folded in as ±1 axis scales."""
    k = jax.random.split(key, 6)
    apply = _bernoulli(k[0], cfg.p_affine, n)
    hflip = _bernoulli(k[4], cfg.p_hflip, n)
    vflip = _bernoulli(k[5], cfg.p_vflip, n)

    angle = jnp.deg2rad(_uniform(k[1], -cfg.rotate_deg, cfg.rotate_deg,
                                 (n,))) * apply
    scale = 1.0 + (_uniform(k[2], cfg.scale_min, cfg.scale_max,
                            (n,)) - 1.0) * apply
    # translate fraction of each axis, sampled independently
    t = _uniform(k[3], -cfg.translate_pct, cfg.translate_pct, (n, 2))
    t = t * apply[:, None] * jnp.asarray([h, w], jnp.float32)

    # Inverse map of (rotate by a, scale s, translate t):
    #   src = R(-a)/s @ (dst - t)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    inv_s = 1.0 / scale
    sign_r = 1.0 - 2.0 * vflip  # row-axis flip
    sign_c = 1.0 - 2.0 * hflip  # col-axis flip
    # rows of the inverse linear map (applied to centered [row, col])
    a00 = inv_s * cos * sign_r
    a01 = inv_s * sin * sign_c
    a10 = -inv_s * sin * sign_r
    a11 = inv_s * cos * sign_c
    lin = jnp.stack([jnp.stack([a00, a01], -1),
                     jnp.stack([a10, a11], -1)], -2)  # (N, 2, 2)
    return lin, t


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _smooth2d(field: Array, sigma: float) -> Array:
    """Separable gaussian blur of (N, H, W) fields."""
    radius = max(1, int(3.0 * sigma))
    k = _gaussian_kernel1d(sigma, radius)
    f = field[:, None]  # (N, 1, H, W) for conv NCHW
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(f.shape, kh.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    f = jax.lax.conv_general_dilated(f, kh, (1, 1),
                                     [(radius, radius), (0, 0)], dimension_numbers=dn)
    f = jax.lax.conv_general_dilated(f, kw, (1, 1),
                                     [(0, 0), (radius, radius)], dimension_numbers=dn)
    return f[:, 0]


def _elastic_displacement(key: Array, cfg: AugmentConfig, n: int, h: int,
                          w: int) -> Tuple[Array, Array]:
    """ElasticTransform fields: alpha * blur(U(-1,1), sigma) per axis."""
    k1, k2, k3 = jax.random.split(key, 3)
    apply = _bernoulli(k3, cfg.p_elastic, n)[:, None, None]
    dy = _smooth2d(_uniform(k1, -1.0, 1.0, (n, h, w)), cfg.elastic_sigma)
    dx = _smooth2d(_uniform(k2, -1.0, 1.0, (n, h, w)), cfg.elastic_sigma)
    return dy * cfg.elastic_alpha * apply, dx * cfg.elastic_alpha * apply


def _grid_distortion_map(key: Array, cfg: AugmentConfig, n: int,
                         size: int, axis_key: int) -> Array:
    """Per-axis piecewise-linear coordinate map for GridDistortion.

    The axis is divided into ``grid_steps`` cells; each cell's width is
    scaled by (1 + U(-limit, limit)); the resulting monotone map is then
    renormalized to span [0, size-1] and evaluated densely (so it stays a
    pure gather-free computation). Returns (N, size) source coordinates.
    """
    steps = cfg.grid_steps
    k1, k2 = jax.random.split(key)
    apply = _bernoulli(k2, cfg.p_grid, n)[:, None]
    factors = 1.0 + _uniform(k1, -cfg.grid_limit, cfg.grid_limit, (n, steps))
    factors = apply * factors + (1.0 - apply)

    cell = size / steps
    widths = factors * cell                       # distorted cell widths
    edges = jnp.concatenate([jnp.zeros((n, 1)), jnp.cumsum(widths, -1)], -1)
    # No renormalization (matches albumentations): undistorted cells give
    # an exact identity map; distorted maps may run past the border and
    # sample the zero border (border_mode=0).

    # Dense inverse evaluation: output coord x lies in cell c = floor(
    # x/cell); source = edges[c] + (x - c*cell) * (edges[c+1]-edges[c])/cell
    x = jnp.arange(size, dtype=jnp.float32)
    c = jnp.clip((x // cell).astype(jnp.int32), 0, steps - 1)
    frac = (x - c.astype(jnp.float32) * cell) / cell
    e0 = jnp.take_along_axis(edges, jnp.broadcast_to(c, (n, size)), axis=1)
    e1 = jnp.take_along_axis(edges, jnp.broadcast_to(c + 1, (n, size)),
                             axis=1)
    return e0 + frac[None, :] * (e1 - e0)


def _grid_sample_bilinear(images: Array, rows: Array, cols: Array) -> Array:
    """Gather-based bilinear sampling with zero border.

    images (N, H, W, C); rows/cols (N, H, W) float source coords.
    """
    n, h, w, c = images.shape
    valid = ((rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1))
    r = jnp.clip(rows, 0.0, h - 1.0)
    cl = jnp.clip(cols, 0.0, w - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(cl).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    wr = (r - r0.astype(r.dtype))[..., None]
    wc = (cl - c0.astype(cl.dtype))[..., None]

    flat = images.reshape(n, h * w, c)

    def gat(ri, ci):
        idx = (ri * w + ci).reshape(n, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, c)

    out = ((gat(r0, c0) * (1 - wr) * (1 - wc))
           + (gat(r0, c1) * (1 - wr) * wc)
           + (gat(r1, c0) * wr * (1 - wc))
           + (gat(r1, c1) * wr * wc))
    return out * valid[..., None].astype(out.dtype)


def _grid_sample_nearest(masks: Array, rows: Array, cols: Array) -> Array:
    """Nearest sampling with zero border for int masks (N, H, W)."""
    n, h, w = masks.shape
    valid = ((rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1))
    ri = jnp.clip(jnp.round(rows), 0, h - 1).astype(jnp.int32)
    ci = jnp.clip(jnp.round(cols), 0, w - 1).astype(jnp.int32)
    flat = masks.reshape(n, h * w)
    idx = (ri * w + ci).reshape(n, h * w)
    out = jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w)
    return jnp.where(valid, out, 0)


def _round_up(frac: Array, lo_idx: Array) -> Array:
    """jnp.round's round-half-even, expressed on (integer floor,
    fractional part): pick the +1 neighbor iff frac > 1/2, or frac ==
    1/2 with an odd floor (the even neighbor is then lo+1)."""
    return (frac > 0.5) | ((frac == 0.5) & (lo_idx % 2 == 1))


def _grid_sample_fused(images: Array, masks: Array, rows: Array,
                       cols: Array) -> Tuple[Array, Array]:
    """Bilinear(image) + nearest(mask) warp in ONE gather.

    The warp gather dominates the whole augmentation program on TPU —
    measured 480 of ~490 ms/batch at (32, 512², 1) — and its cost is
    per-INDEX, not per-byte: a c-channel ``take_along_axis`` costs
    almost the same as c=1 (87 → 123 ms for c=1 → 8 at 8.4M indices).
    So instead of 5 separate gathers (4 bilinear taps + 1 nearest mask
    tap), pre-stack every pixel's 2×2 neighborhood of the image AND the
    mask into 8 channels (full-bandwidth elementwise views) and gather
    once. The nearest mask tap is always one of the 4 fetched corners
    (per-axis rounding selects it), so the mask costs nothing extra.

    Bit-identical to `_grid_sample_bilinear` + `_grid_sample_nearest`
    (incl. zero border and round-half-even ties; golden-tested in
    tests/test_data.py). NOTE: the natural `lax.gather` with
    slice_sizes=(2, 2) expresses this directly but kernel-faults the
    experimental tunneled TPU backend (reproduced twice); the
    neighborhood-stack + slice-size-1 gather is the stable form.
    """
    n, h, w, c = images.shape
    valid = ((rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1))
    r = jnp.clip(rows, 0.0, h - 1.0)
    cl = jnp.clip(cols, 0.0, w - 1.0)
    r0 = jnp.minimum(jnp.floor(r).astype(jnp.int32), h - 2)
    c0 = jnp.minimum(jnp.floor(cl).astype(jnp.int32), w - 2)
    wr = r - r0
    wc = cl - c0

    img2d = images[..., 0]
    mskf = masks.astype(images.dtype)
    imgp = jnp.pad(img2d, ((0, 0), (0, 1), (0, 1)))
    mskp = jnp.pad(mskf, ((0, 0), (0, 1), (0, 1)))
    nb = jnp.stack([imgp[:, :h, :w], imgp[:, :h, 1:w + 1],
                    imgp[:, 1:h + 1, :w], imgp[:, 1:h + 1, 1:w + 1],
                    mskp[:, :h, :w], mskp[:, :h, 1:w + 1],
                    mskp[:, 1:h + 1, :w], mskp[:, 1:h + 1, 1:w + 1]], -1)
    idx = (r0 * w + c0).reshape(n, h * w, 1)
    taps = jnp.take_along_axis(nb.reshape(n, h * w, 8), idx,
                               axis=1).reshape(n, h, w, 8)

    img = (taps[..., 0] * (1 - wr) * (1 - wc)
           + taps[..., 1] * (1 - wr) * wc
           + taps[..., 2] * wr * (1 - wc)
           + taps[..., 3] * wr * wc)
    img = (img * valid.astype(img.dtype))[..., None]

    ri = _round_up(wr, r0)
    ci = _round_up(wc, c0)
    msk = jnp.where(ri[..., None], taps[..., 6:8], taps[..., 4:6])
    msk = jnp.where(ci, msk[..., 1], msk[..., 0])
    msk = jnp.where(valid, msk, 0).astype(masks.dtype)
    return img, msk


def _coarse_dropout(key: Array, images: Array, cfg: AugmentConfig) -> Array:
    """CoarseDropout: 1-4 zero-filled rectangles, 3-6% of H/W each,
    applied to the image only (matching the reference's CoarseDropout
    without mask fill, augmentations.py:80-86)."""
    n, h, w, _ = images.shape
    kmax = cfg.dropout_holes_max
    k = jax.random.split(key, 6)
    apply = _bernoulli(k[0], cfg.p_dropout, n)
    n_holes = jax.random.randint(k[1], (n,), 1, kmax + 1)
    # hole height and width are sampled INDEPENDENTLY (albumentations
    # CoarseDropout semantics) — distinct keys, not a shared one
    hole_h = _uniform(k[2], cfg.hole_frac_min, cfg.hole_frac_max,
                      (n, kmax)) * h
    hole_w = _uniform(k[5], cfg.hole_frac_min, cfg.hole_frac_max,
                      (n, kmax)) * w
    top = _uniform(k[3], 0.0, 1.0, (n, kmax)) * (h - hole_h)
    left = _uniform(k[4], 0.0, 1.0, (n, kmax)) * (w - hole_w)

    rows = jnp.arange(h, dtype=jnp.float32)[None, None, :]      # (1,1,H)
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    in_r = ((rows >= top[..., None]) &
            (rows < (top + hole_h)[..., None]))                 # (N,K,H)
    in_c = ((cols >= left[..., None]) &
            (cols < (left + hole_w)[..., None]))                # (N,K,W)
    hole_on = (jnp.arange(kmax)[None, :] < n_holes[:, None])    # (N,K)
    hole_on = hole_on & (apply[:, None] > 0)
    covered = jnp.einsum('nkh,nkw->nhw',
                         (in_r & hole_on[..., None]).astype(jnp.float32),
                         in_c.astype(jnp.float32)) > 0
    return images * (~covered)[..., None].astype(images.dtype)


@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_batch(images: Array, masks: Array, key: Array,
                  cfg: AugmentConfig) -> Tuple[Array, Array]:
    """Full train-time augmentation. images (N,H,W,C) in [0,1] float32,
    masks (N,H,W) int -> (normalized images, masks)."""
    n, h, w, _ = images.shape
    keys = jax.random.split(key, 8)

    # ---- geometric: one composed sampling grid ----
    lin, trans = _affine_matrices(keys[0], cfg, n, h, w)
    dy, dx = _elastic_displacement(keys[1], cfg, n, h, w)
    kgr, kgc = jax.random.split(keys[2])
    src_r_axis = _grid_distortion_map(kgr, cfg, n, h, 0)    # (N, H)
    src_c_axis = _grid_distortion_map(kgc, cfg, n, w, 1)    # (N, W)

    base_r = jnp.broadcast_to(src_r_axis[:, :, None], (n, h, w)) + dy
    base_c = jnp.broadcast_to(src_c_axis[:, None, :], (n, h, w)) + dx

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    pr = base_r - trans[:, 0, None, None] - cy
    pc = base_c - trans[:, 1, None, None] - cx
    rows = lin[:, 0, 0, None, None] * pr + lin[:, 0, 1, None, None] * pc + cy
    cols = lin[:, 1, 0, None, None] * pr + lin[:, 1, 1, None, None] * pc + cx

    use_pallas = False
    if images.shape[-1] == 1 and _pallas_warp_requested():
        from unet_tpu.ops.pallas.warp import (grid_sample_fused_pallas,
                                              warp_supported)
        use_pallas = warp_supported(images)
    if use_pallas:  # banded VMEM-local gather, bit-equal to the fused path
        images, masks = grid_sample_fused_pallas(images, masks, rows, cols)
    elif images.shape[-1] == 1:  # the CT pipeline: one fused gather
        images, masks = _grid_sample_fused(images, masks, rows, cols)
    else:
        images = _grid_sample_bilinear(images, rows, cols)
        masks = _grid_sample_nearest(masks, rows, cols)

    # ---- photometric (image only) ----
    kb = jax.random.split(keys[3], 3)
    apply_b = _bernoulli(kb[0], cfg.p_brightness, n)[:, None, None, None]
    alpha = 1.0 + _uniform(kb[1], -cfg.contrast_limit, cfg.contrast_limit,
                           (n, 1, 1, 1)) * apply_b
    beta = _uniform(kb[2], -cfg.brightness_limit, cfg.brightness_limit,
                    (n, 1, 1, 1)) * apply_b
    images = jnp.clip(images * alpha + beta, 0.0, 1.0)

    kn = jax.random.split(keys[4], 3)
    apply_n = _bernoulli(kn[0], cfg.p_noise, n)[:, None, None, None]
    std = _uniform(kn[1], cfg.noise_std_min, cfg.noise_std_max,
                   (n, 1, 1, 1))
    noise = jax.random.normal(kn[2], images.shape) * std * apply_n
    images = jnp.clip(images + noise, 0.0, 1.0)

    images = _coarse_dropout(keys[5], images, cfg)

    images = (images - cfg.mean) / cfg.std
    return images, masks


@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_batch_seeded(images: Array, masks: Array, seed_step: Array,
                         cfg: AugmentConfig) -> Tuple[Array, Array]:
    """Multi-controller-safe ``augment_batch``: ``seed_step`` is a host
    (seed, step) uint32 pair and the PRNG key is derived *inside* the
    program. A process-local key array crossing the jit boundary would
    clash with the global (mesh-sharded) batch arrays in multi-host
    runs; host numpy inputs are treated as replicated instead."""
    key = jax.random.fold_in(jax.random.key(seed_step[0]), seed_step[1])
    return augment_batch(images, masks, key, cfg)


def normalize_batch(images: Array, mean: float = 0.5,
                    std: float = 0.5) -> Array:
    """Val/test 'transform': Normalize(0.5, 0.5) only
    (ref augmentations.py:92-116; resize happens in the dataset layer)."""
    return (images - mean) / std
