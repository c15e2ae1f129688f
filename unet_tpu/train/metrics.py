"""Segmentation metrics with an on-device confusion matrix.

TPU-native re-design of the reference ``SegmentationMetrics``
(unet/utils/metrics.py:16-157): the reference accumulates a numpy
confusion matrix with a per-pixel Python loop (metrics.py:82-84, a CPU
hotspot); here the batch update is a single jitted
``bincount(num_classes * target + pred)`` on device, and only the tiny
(C, C) matrix crosses to the host (or is accumulated on device across
batches). Under GSPMD sharding the bincount's sum reduces globally, so
multi-chip eval needs no explicit collectives.

``compute()`` reproduces the reference numbers exactly, including the
quirk that mean IoU / mean Dice average only classes with value > 0
(ref metrics.py:131-135).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=('num_classes', 'ignore_index'))
def confusion_matrix_update(predictions: Array, targets: Array,
                            num_classes: int,
                            ignore_index: Optional[int] = None) -> Array:
    """Batch confusion-matrix increment, fully on device.

    predictions: logits (N, H, W, C) or class indices (N, H, W)
    targets: class indices (N, H, W)
    Returns an int32 (num_classes, num_classes) matrix where [t, p] counts
    pixels of true class t predicted as p. Out-of-range labels are dropped,
    matching the reference's bounds check (metrics.py:83).
    """
    if predictions.ndim == 4:
        predictions = jnp.argmax(predictions, axis=-1)
    t = targets.reshape(-1).astype(jnp.int32)
    p = predictions.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < num_classes) & (p >= 0) & (p < num_classes)
    if ignore_index is not None:
        valid &= (t != ignore_index)
    idx = jnp.where(valid, t * num_classes + p, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.int32)


def metrics_from_confusion(cm) -> Dict[str, float]:
    """Pixel accuracy, per-class/mean IoU and Dice from a confusion matrix,
    number-compatible with ref metrics.py:86-143 (given default class
    names; pass through ``SegmentationMetrics`` for custom names)."""
    return SegmentationMetrics._compute_from(np.asarray(cm),
                                             [f'class_{i}' for i in
                                              range(np.asarray(cm).shape[0])])


class SegmentationMetrics:
    """Stateful accumulator with the reference's API (update / compute /
    reset / get_confusion_matrix), but device-friendly internals."""

    def __init__(self, num_classes: int = 2,
                 class_names: Optional[List[str]] = None,
                 ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.class_names = class_names or [f'class_{i}'
                                           for i in range(num_classes)]
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self._cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        self._pending = []

    def update(self, predictions, targets) -> None:
        """Enqueue a batch. The bincount runs on device; the result stays
        as a device array so eval loops don't sync per batch."""
        self._pending.append(confusion_matrix_update(
            jnp.asarray(predictions), jnp.asarray(targets),
            self.num_classes, self.ignore_index))

    def update_from_matrix(self, cm) -> None:
        """Accumulate a precomputed (C, C) confusion matrix (e.g. returned
        from a jitted eval step)."""
        self._pending.append(cm)

    def _drain(self) -> None:
        if self._pending:
            for cm in self._pending:
                self._cm += np.asarray(cm, dtype=np.int64)
            self._pending = []

    def compute(self) -> Dict[str, float]:
        self._drain()
        return self._compute_from(self._cm, self.class_names)

    @staticmethod
    def _compute_from(cm: np.ndarray, class_names: List[str]
                      ) -> Dict[str, float]:
        num_classes = cm.shape[0]
        total = cm.sum()
        if total == 0:
            zero = {name: 0.0 for name in class_names}
            return {'pixel_accuracy': 0.0, 'mean_iou': 0.0, 'mean_dice': 0.0,
                    'class_iou': dict(zero), 'class_dice': dict(zero)}
        pixel_accuracy = np.diag(cm).sum() / total
        class_iou, class_dice = {}, {}
        for i in range(num_classes):
            tp = cm[i, i]
            fp = cm[:, i].sum() - tp
            fn = cm[i, :].sum() - tp
            iou_d = tp + fp + fn
            dice_d = 2 * tp + fp + fn
            class_iou[class_names[i]] = float(tp / iou_d) if iou_d > 0 else 0.0
            class_dice[class_names[i]] = (float(2 * tp / dice_d)
                                          if dice_d > 0 else 0.0)
        # The reference averages only classes with metric > 0
        # (metrics.py:131-135) — preserved for number parity.
        valid_ious = [v for v in class_iou.values() if v > 0]
        valid_dices = [v for v in class_dice.values() if v > 0]
        return {
            'pixel_accuracy': float(pixel_accuracy),
            'mean_iou': float(np.mean(valid_ious)) if valid_ious else 0.0,
            'mean_dice': float(np.mean(valid_dices)) if valid_dices else 0.0,
            'class_iou': class_iou,
            'class_dice': class_dice,
        }

    def get_confusion_matrix(self) -> np.ndarray:
        self._drain()
        return self._cm.copy()


def compute_iou(pred: Array, target: Array, num_classes: int = 2,
                smooth: float = 1e-6) -> Array:
    """Stateless per-class IoU (ref metrics.py:160-193). pred/target are
    class-index arrays; returns (num_classes,) float32."""
    pred_oh = jax.nn.one_hot(pred.reshape(-1), num_classes)
    tgt_oh = jax.nn.one_hot(target.reshape(-1), num_classes)
    inter = jnp.sum(pred_oh * tgt_oh, axis=0)
    union = jnp.sum(pred_oh, axis=0) + jnp.sum(tgt_oh, axis=0) - inter
    return (inter + smooth) / (union + smooth)


def compute_dice(pred: Array, target: Array, num_classes: int = 2,
                 smooth: float = 1e-6) -> Array:
    """Stateless per-class Dice (ref metrics.py:196-227)."""
    pred_oh = jax.nn.one_hot(pred.reshape(-1), num_classes)
    tgt_oh = jax.nn.one_hot(target.reshape(-1), num_classes)
    inter = jnp.sum(pred_oh * tgt_oh, axis=0)
    total = jnp.sum(pred_oh, axis=0) + jnp.sum(tgt_oh, axis=0)
    return (2.0 * inter + smooth) / (total + smooth)
