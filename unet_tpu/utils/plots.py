"""Plotting utilities: training curves, prediction grids, confusion
matrix, overlays. Functional re-implementation of the reference plotting
module (unet/utils/plots.py:24-307) for NHWC jax/numpy arrays; artifact
formats (2-panel curves PNG, Nx3 prediction grid, normalized CM heatmap,
red-GT/green-pred overlay) match so downstream tooling keeps working.
Denormalization assumes mean=std=0.5 like the reference (plots.py:132).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

try:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    _HAS_MPL = True
except ImportError:  # pragma: no cover
    _HAS_MPL = False


def _require_mpl():
    if not _HAS_MPL:
        raise ImportError('matplotlib is required for plotting')


def plot_training_curves(history: Dict[str, List[float]], save_path=None,
                         dpi: int = 150):
    """Two-panel loss/metric curves (ref plots.py:24-80)."""
    _require_mpl()
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    epochs = range(1, len(history.get('train_loss', [])) + 1)
    ax = axes[0]
    if 'train_loss' in history:
        ax.plot(epochs, history['train_loss'], label='train')
    if 'val_loss' in history:
        ax.plot(epochs, history['val_loss'], label='val')
    ax.set_xlabel('epoch')
    ax.set_ylabel('loss')
    ax.set_title('Loss')
    ax.legend()
    ax.grid(alpha=0.3)

    ax = axes[1]
    for key, label in (('val_dice', 'mean dice'), ('tumor_dice',
                                                   'tumor dice'),
                       ('val_iou', 'mean IoU')):
        if key in history and history[key]:
            ax.plot(epochs, history[key], label=label)
    ax.set_xlabel('epoch')
    ax.set_ylabel('metric')
    ax.set_title('Validation metrics')
    ax.legend()
    ax.grid(alpha=0.3)

    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return None
    return fig


def _denorm(img: np.ndarray, mean: float = 0.5, std: float = 0.5):
    return np.clip(img * std + mean, 0.0, 1.0)


def plot_predictions(images, masks, predictions, num_samples: int = 4,
                     save_path=None, class_names: Optional[List[str]] = None,
                     dpi: int = 150):
    """N x 3 grid: input | ground truth | prediction (ref plots.py:83-167).
    images (N, H, W, C) normalized; masks (N, H, W); predictions can be
    logits (N, H, W, C) or class maps (N, H, W)."""
    _require_mpl()
    images = np.asarray(images)
    masks = np.asarray(masks)
    predictions = np.asarray(predictions)
    if predictions.ndim == 4:
        predictions = predictions.argmax(-1)
    n = min(num_samples, images.shape[0])
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n))
    if n == 1:
        axes = axes[None, :]
    for i in range(n):
        axes[i, 0].imshow(_denorm(images[i, ..., 0]), cmap='gray')
        axes[i, 0].set_title('input' if i == 0 else '')
        axes[i, 1].imshow(masks[i], cmap='viridis', vmin=0,
                          vmax=max(1, masks.max()))
        axes[i, 1].set_title('ground truth' if i == 0 else '')
        axes[i, 2].imshow(predictions[i], cmap='viridis', vmin=0,
                          vmax=max(1, masks.max()))
        axes[i, 2].set_title('prediction' if i == 0 else '')
        for j in range(3):
            axes[i, j].axis('off')
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return None
    return fig


def plot_confusion_matrix(cm, class_names: Optional[List[str]] = None,
                          save_path=None, normalize: bool = True,
                          dpi: int = 150):
    """Normalized CM heatmap with annotations (ref plots.py:170-237)."""
    _require_mpl()
    cm = np.asarray(cm, np.float64)
    if normalize:
        row = cm.sum(axis=1, keepdims=True)
        cm = np.divide(cm, row, out=np.zeros_like(cm), where=row > 0)
    n = cm.shape[0]
    class_names = class_names or [f'class_{i}' for i in range(n)]
    fig, ax = plt.subplots(figsize=(4 + n, 3 + n))
    im = ax.imshow(cm, cmap='Blues', vmin=0,
                   vmax=1 if normalize else None)
    fig.colorbar(im, ax=ax)
    ax.set_xticks(range(n), class_names, rotation=45)
    ax.set_yticks(range(n), class_names)
    ax.set_xlabel('predicted')
    ax.set_ylabel('true')
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f'{cm[i, j]:.2f}' if normalize else f'{int(cm[i, j])}',
                    ha='center', va='center',
                    color='white' if cm[i, j] > 0.5 * (cm.max() or 1) else 'black')
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return None
    return fig


def plot_sample_with_overlay(image, mask, prediction, save_path=None,
                             alpha: float = 0.4, dpi: int = 150):
    """Red GT / green prediction alpha overlays (ref plots.py:240-307).
    image (H, W) or (H, W, 1) normalized; mask/prediction (H, W)."""
    _require_mpl()
    image = np.asarray(image)
    if image.ndim == 3:
        image = image[..., 0]
    base = _denorm(image)
    rgb_gt = np.stack([base] * 3, -1)
    rgb_pr = rgb_gt.copy()
    gt = np.asarray(mask) > 0
    pr = np.asarray(prediction) > 0
    rgb_gt[gt] = (1 - alpha) * rgb_gt[gt] + alpha * np.array([1.0, 0, 0])
    rgb_pr[pr] = (1 - alpha) * rgb_pr[pr] + alpha * np.array([0, 1.0, 0])
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, title) in zip(axes, [(base, 'input'),
                                       (rgb_gt, 'GT (red)'),
                                       (rgb_pr, 'prediction (green)')]):
        ax.imshow(img, cmap='gray' if img.ndim == 2 else None)
        ax.set_title(title)
        ax.axis('off')
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return None
    return fig
