"""Segmentation losses, vectorized for TPU (no per-image Python loops).

Functional re-design of the reference loss suite (unet/utils/loss.py):

* ``dice_loss`` — softmax -> one-hot -> per-class Dice over (H, W) with
  smooth=1.0, optionally dropping the background class
  (ref loss.py:18-85).
* ``balanced_ce_loss`` — per-image dynamic pixel weighting: each image's
  tumor pixels share total weight ``class_weight`` and background pixels
  share ``1-class_weight`` (ref loss.py:88-150). The reference's Python
  loop over the batch (loss.py:134-145) becomes a batched masked
  reduction.
* ``dice_bce_loss`` — ce_weight*balanced_ce + dice_weight*dice
  (ref loss.py:153-191).
* ``deep_supervision_loss`` — weighted sum over [main, ds1, ds2, ds3]
  with weights [1.0, 0.4, 0.2, 0.1] (ref loss.py:194-229).
* ``create_loss_function`` — factory with the same names
  ('dice' | 'ce'/'crossentropy' | 'balanced_ce' | 'dice_bce'),
  ref loss.py:232-271.

All functions take float32 logits (N, H, W, C) — NHWC, TPU layout — and
integer targets (N, H, W), and return a scalar loss.

Every loss additionally accepts ``sample_weights`` (N,) — used by the
multi-host eval path, where tail batches are padded to a static shape by
repeating the last sample: weight-0 pad rows contribute nothing, so the
padded-batch loss equals the loss over only the real rows (the value a
single-process run computes on its smaller tail batch). Weighting keeps
each loss's own normalization semantics (per-batch for dice/balanced_ce,
per-pixel-weight-sum for weighted CE), not a generic mean.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

DS_WEIGHTS = (1.0, 0.4, 0.2, 0.1)


def dice_loss(logits: Array, targets: Array, smooth: float = 1.0,
              ignore_background: bool = True,
              reduction: str = 'mean',
              sample_weights: Optional[Array] = None) -> Array:
    """Soft Dice loss. Ref loss.py:18-85. ``sample_weights`` applies to
    the 'mean' reduction only (a weighted mean over samples of the
    per-sample class-mean dice)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    intersection = jnp.sum(probs * one_hot, axis=(1, 2))      # (N, C)
    union = jnp.sum(probs, axis=(1, 2)) + jnp.sum(one_hot, axis=(1, 2))
    dice = (2.0 * intersection + smooth) / (union + smooth)
    if ignore_background and num_classes > 1:
        dice = dice[:, 1:]
    if reduction == 'mean':
        if sample_weights is None:
            return 1.0 - jnp.mean(dice)
        w = sample_weights.astype(jnp.float32)
        return 1.0 - (jnp.sum(jnp.mean(dice, axis=1) * w)
                      / jnp.maximum(jnp.sum(w), 1e-12))
    if reduction == 'sum':
        return jnp.sum(1.0 - dice)
    return 1.0 - dice


def cross_entropy_loss(logits: Array, targets: Array,
                       class_weights: Optional[Sequence[float]] = None,
                       sample_weights: Optional[Array] = None) -> Array:
    """Standard (optionally class-weighted) CE, matching
    torch.nn.CrossEntropyLoss semantics: with class weights the mean is
    normalized by the sum of per-pixel weights. Ref loss.py:257-261."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if class_weights is None:
        if sample_weights is None:
            return jnp.mean(nll)
        sw = sample_weights.astype(jnp.float32)
        px = nll.shape[1] * nll.shape[2]
        return (jnp.sum(nll * sw[:, None, None])
                / jnp.maximum(jnp.sum(sw) * px, 1e-12))
    w = jnp.asarray(class_weights, jnp.float32)[targets]
    if sample_weights is not None:
        w = w * sample_weights.astype(jnp.float32)[:, None, None]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def balanced_ce_loss(logits: Array, targets: Array,
                     class_weight: float = 0.5,
                     smooth: float = 1e-6,
                     sample_weights: Optional[Array] = None) -> Array:
    """Per-image class-balanced CE. Ref loss.py:88-150.

    weight(pixel of class 1) = class_weight / (#class-1 pixels + smooth)
    weight(pixel of class 0) = (1-class_weight) / (#class-0 pixels + smooth)
    loss = sum(ce * weight) / N. Binary by construction (classes {0, 1}),
    exactly like the reference (loss.py:136-137).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    tumor = (targets == 1)
    bg = (targets == 0)
    n_tumor = jnp.sum(tumor, axis=(1, 2), dtype=jnp.float32) + smooth  # (N,)
    n_bg = jnp.sum(bg, axis=(1, 2), dtype=jnp.float32) + smooth
    w = (tumor * (class_weight / n_tumor)[:, None, None]
         + bg * ((1.0 - class_weight) / n_bg)[:, None, None])
    if sample_weights is None:
        return jnp.sum(ce * w) / logits.shape[0]
    sw = sample_weights.astype(jnp.float32)
    return (jnp.sum(ce * w * sw[:, None, None])
            / jnp.maximum(jnp.sum(sw), 1e-12))


def _dice_bce_binary_fast(logits: Array, targets: Array, ce_weight: float,
                          dice_weight: float, class_weight: float,
                          dice_smooth: float = 1.0,
                          bce_smooth: float = 1e-6,
                          sample_weights: Optional[Array] = None) -> Array:
    """Fused binary (2-class) DiceBCE: mathematically identical to
    balanced_ce + dice(ignore_background) but derived entirely from the
    logit margin d = l1 - l0, cutting the number of (N, H, W) f32
    elementwise passes roughly in half (this loss runs on full-res
    512x512 maps, so it is HBM-traffic that matters):

      p1 = sigmoid(d)          (= softmax(l)[..., 1])
      ce = softplus(-d) on tumor px, softplus(d) on background px
      dice over class 1 only; balanced per-image pixel weights as in
      ref loss.py:129-148.
    """
    d = (logits[..., 1] - logits[..., 0]).astype(jnp.float32)  # (N,H,W)
    t = (targets == 1)
    tf = t.astype(jnp.float32)

    p1 = jax.nn.sigmoid(d)
    inter = jnp.sum(p1 * tf, axis=(1, 2))
    union = jnp.sum(p1, axis=(1, 2)) + jnp.sum(tf, axis=(1, 2))
    dice = (2.0 * inter + dice_smooth) / (union + dice_smooth)

    ce = jnp.where(t, jax.nn.softplus(-d), jax.nn.softplus(d))
    n_tumor = jnp.sum(tf, axis=(1, 2)) + bce_smooth
    n_bg = jnp.sum(1.0 - tf, axis=(1, 2)) + bce_smooth
    w = jnp.where(t, (class_weight / n_tumor)[:, None, None],
                  ((1.0 - class_weight) / n_bg)[:, None, None])
    if sample_weights is None:
        dice_term = 1.0 - jnp.mean(dice)
        ce_term = jnp.sum(ce * w) / logits.shape[0]
    else:
        sw = sample_weights.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(sw), 1e-12)
        dice_term = 1.0 - jnp.sum(dice * sw) / denom
        ce_term = jnp.sum(ce * w * sw[:, None, None]) / denom
    return ce_weight * ce_term + dice_weight * dice_term


def dice_bce_loss(logits: Array, targets: Array, ce_weight: float = 1.0,
                  dice_weight: float = 1.0,
                  class_weight: float = 0.5,
                  sample_weights: Optional[Array] = None) -> Array:
    """Balanced CE + Dice combo. Ref loss.py:153-191. Binary inputs take
    the fused margin-based fast path (identical numerics, fewer HBM
    passes)."""
    if logits.shape[-1] == 2:
        return _dice_bce_binary_fast(logits, targets, ce_weight,
                                     dice_weight, class_weight,
                                     sample_weights=sample_weights)
    return (ce_weight * balanced_ce_loss(logits, targets, class_weight,
                                         sample_weights=sample_weights)
            + dice_weight * dice_loss(logits, targets,
                                      ignore_background=True,
                                      sample_weights=sample_weights))


def deep_supervision_loss(base_loss: Callable[..., Array],
                          predictions, targets: Array,
                          weights: Sequence[float] = DS_WEIGHTS,
                          sample_weights: Optional[Array] = None) -> Array:
    """Weighted multi-head loss; passthrough for single tensors.
    Ref loss.py:194-229."""
    kw = {} if sample_weights is None else {'sample_weights': sample_weights}
    if isinstance(predictions, (list, tuple)):
        total = 0.0
        for pred, w in zip(predictions, weights):
            total += w * base_loss(pred, targets, **kw)
        return total
    return base_loss(predictions, targets, **kw)


def create_loss_function(loss_type: str = 'dice_bce', ce_weight: float = 1.0,
                         dice_weight: float = 1.0,
                         class_weights: Optional[Sequence[float]] = None,
                         balanced_class_weight: float = 0.5,
                         deep_supervision: bool = False,
                         **_: object) -> Callable:
    """Factory mirroring ref loss.py:232-271 (+ optional DS wrapping as
    done in ref train.py:326-342). Returns fn(predictions, targets)."""
    loss_type = loss_type.lower()
    if loss_type == 'dice':
        base = lambda p, t, sample_weights=None: dice_loss(
            p, t, ignore_background=True, sample_weights=sample_weights)
    elif loss_type in ('ce', 'crossentropy'):
        base = lambda p, t, sample_weights=None: cross_entropy_loss(
            p, t, class_weights, sample_weights=sample_weights)
    elif loss_type == 'balanced_ce':
        base = lambda p, t, sample_weights=None: balanced_ce_loss(
            p, t, balanced_class_weight, sample_weights=sample_weights)
    elif loss_type == 'dice_bce':
        base = lambda p, t, sample_weights=None: dice_bce_loss(
            p, t, ce_weight, dice_weight, balanced_class_weight,
            sample_weights=sample_weights)
    else:
        raise ValueError(f'Unknown loss type: {loss_type}')
    if deep_supervision:
        return lambda p, t, sample_weights=None: deep_supervision_loss(
            base, p, t, sample_weights=sample_weights)
    return lambda p, t, sample_weights=None: (
        deep_supervision_loss(base, p, t, sample_weights=sample_weights)
        if isinstance(p, (list, tuple))
        else base(p, t, sample_weights=sample_weights))
