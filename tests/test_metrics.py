"""Metrics tests: hand-computed confusion matrices + golden comparison with
the reference SegmentationMetrics (per-pixel loop) when mounted."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from unet_tpu.train.metrics import (
    SegmentationMetrics,
    compute_dice,
    compute_iou,
    confusion_matrix_update,
)

REF = Path('/root/reference')


def test_confusion_matrix_simple():
    t = np.array([[[0, 0], [1, 1]]])
    p = np.array([[[0, 1], [1, 1]]])
    cm = np.asarray(confusion_matrix_update(jnp.asarray(p), jnp.asarray(t),
                                            num_classes=2))
    np.testing.assert_array_equal(cm, [[1, 1], [0, 2]])


def test_confusion_matrix_from_logits():
    logits = np.zeros((1, 2, 2, 2), np.float32)
    logits[..., 1] = 5.0  # always predict class 1
    t = np.array([[[0, 1], [1, 0]]])
    cm = np.asarray(confusion_matrix_update(jnp.asarray(logits),
                                            jnp.asarray(t), num_classes=2))
    np.testing.assert_array_equal(cm, [[0, 2], [0, 2]])


def test_ignore_index():
    t = np.array([[[0, 255], [1, 1]]])
    p = np.array([[[0, 0], [1, 1]]])
    cm = np.asarray(confusion_matrix_update(
        jnp.asarray(p), jnp.asarray(t), num_classes=2, ignore_index=255))
    assert cm.sum() == 3


def test_perfect_metrics():
    m = SegmentationMetrics(num_classes=2, class_names=['background', 'tumor'])
    t = (np.arange(64).reshape(1, 8, 8) % 5 == 0).astype(np.int64)
    m.update(t, t)
    r = m.compute()
    assert r['pixel_accuracy'] == 1.0
    assert r['class_dice']['tumor'] == 1.0
    assert r['mean_iou'] == 1.0


def test_empty_results():
    m = SegmentationMetrics(num_classes=2)
    r = m.compute()
    assert r == {'pixel_accuracy': 0.0, 'mean_iou': 0.0, 'mean_dice': 0.0,
                 'class_iou': {'class_0': 0.0, 'class_1': 0.0},
                 'class_dice': {'class_0': 0.0, 'class_1': 0.0}}


def test_stateless_iou_dice(rng):
    p = (rng.random((4, 4)) > 0.5).astype(np.int32)
    t = (rng.random((4, 4)) > 0.5).astype(np.int32)
    iou = np.asarray(compute_iou(jnp.asarray(p), jnp.asarray(t)))
    dice = np.asarray(compute_dice(jnp.asarray(p), jnp.asarray(t)))
    for c in (0, 1):
        inter = np.sum((p == c) & (t == c))
        union = np.sum((p == c) | (t == c))
        np.testing.assert_allclose(iou[c], (inter + 1e-6) / (union + 1e-6),
                                   rtol=1e-5)
        total = np.sum(p == c) + np.sum(t == c)
        np.testing.assert_allclose(dice[c], (2 * inter + 1e-6) / (total + 1e-6),
                                   rtol=1e-5)


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
def test_matches_reference_over_batches(rng):
    torch = pytest.importorskip('torch')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.utils.metrics import SegmentationMetrics as RefMetrics

    ours = SegmentationMetrics(num_classes=2,
                               class_names=['background', 'tumor'])
    ref = RefMetrics(num_classes=2, class_names=['background', 'tumor'])
    for _ in range(3):
        logits = rng.standard_normal((2, 12, 12, 2), dtype=np.float32)
        targets = (rng.random((2, 12, 12)) > 0.7).astype(np.int64)
        ours.update(jnp.asarray(logits), jnp.asarray(targets))
        ref.update(torch.from_numpy(logits).permute(0, 3, 1, 2),
                   torch.from_numpy(targets))
    got, want = ours.compute(), ref.compute()
    assert got.keys() == want.keys()
    for k in ('pixel_accuracy', 'mean_iou', 'mean_dice'):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9)
    for k in ('class_iou', 'class_dice'):
        for name in want[k]:
            np.testing.assert_allclose(got[k][name], want[k][name], rtol=1e-9)
    np.testing.assert_array_equal(ours.get_confusion_matrix(),
                                  ref.get_confusion_matrix())
