"""Odd/non-native geometry through the FULL stack: non-square,
non-512 source volumes -> converter CLI -> slice cache -> one train
epoch -> predict CLI, at img_sizes that are NOT multiples of 16 (the
UNet downsamples 4x, so these force the decoder's pad_to_match path at
every level — ref layers.py:84-97 pads the upsampled map to the skip).

The component pieces (pad_to_match, resizers, converter) are unit
tested elsewhere; this asserts the CLIs actually compose at such
geometries — the reference supports arbitrary --img-size / source
sizes (ref predict.py:100-135 resizes anything to img_size and restores
the original size on output), so capability parity requires the same
here end-to-end.
"""

import sys
import zipfile
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))
sys.path.insert(0, str(REPO / 'toolkits'))  # flat import, like onramp test

from test_toolkits import _make_gt_pkl, write_nifti1  # noqa: E402

# 36: every decoder level is odd/padded (36->18->9->4->2; 2->4->8+pad->
# 9->18->36). 50: odd at a deeper level (50->25->12->6->3).
ODD_SIZES = [36, 50]


def _make_source(tmp_path, h=40, w=28, slices=6, n_vols=4):
    """Kaggle-wire-format task of NON-SQUARE volumes (slices h x w)."""
    rng = np.random.default_rng(17)
    task = tmp_path / 'src' / 'Task077_Odd'
    gt = task / 'GroundTruth'
    gt.mkdir(parents=True)
    nii_dir = tmp_path / 'nii'
    nii_dir.mkdir()
    shape = (h, w, slices)
    with zipfile.ZipFile(task / 'CT.zip', 'w') as zf:
        for v in range(1, n_vols + 1):
            ct = (rng.standard_normal(shape) * 300).astype(np.int16)
            write_nifti1(nii_dir / f'{v}.nii', ct)
            zf.write(nii_dir / f'{v}.nii', f'{v}.nii')
            _make_gt_pkl(gt / f'{v}.pkl', shape,
                         [(slice(6, 22), slice(4, 18), slice(1, 3)),
                          (slice(10, 30), slice(8, 24), slice(4, 5))])
    return tmp_path / 'src'


@pytest.mark.parametrize('img_size', ODD_SIZES)
def test_odd_size_convert_cache_train_predict(tmp_path, img_size):
    src = _make_source(tmp_path)

    # ---- convert (writes 40x28 non-square PNGs) ----
    from convert_medical_segmentation import main as convert_main
    out = tmp_path / 'dataset'
    old = sys.argv
    sys.argv = ['convert', '--input', str(src), '--output', str(out),
                '--task', 'Task077', '--empty-ratio', '0.5', '--seed', '5']
    try:
        convert_main()
    finally:
        sys.argv = old
    from PIL import Image
    pngs = sorted((out / 'images').glob('*.png'))
    assert pngs and Image.open(pngs[0]).size == (28, 40)  # (W, H)

    # ---- cache at the odd img_size ----
    from unet_tpu.data.cache import CachedSliceDataset, build_cache
    blob = tmp_path / f'cache{img_size}.bin'
    build_cache(out, blob, img_size=img_size)
    ds = CachedSliceDataset(blob, 'train', val_ratio=0.25, seed=5)
    im, mk = ds.load_raw(0)
    assert im.shape == (img_size, img_size)
    assert mk.shape == (img_size, img_size)

    # ---- one train epoch at the odd size (aug ON: the geometric
    # pipeline must also hold at non-tile-aligned shapes) ----
    import yaml
    cfg = {
        'model': {'type': 'attention_unet', 'n_channels': 1,
                  'n_classes': 2, 'bilinear': True, 'base_features': 4,
                  'deep_supervision': False},
        'data': {'root': str(out), 'img_size': img_size,
                 'val_ratio': 0.25, 'batch_size': 2, 'num_workers': 1},
        'train': {'epochs': 1, 'lr': 0.001, 'weight_decay': 0.0001,
                  'grad_clip': 1.0, 'accumulation_steps': 2},
        'scheduler': {'type': 'cosine_annealing', 'min_lr': 1e-6},
        'ema': {'enabled': False},
        'early_stopping': {'enabled': False,
                           'monitor': 'class_dice.tumor', 'mode': 'max'},
        'loss': {'type': 'dice_bce', 'balanced_class_weight': 0.5,
                 'ce_weight': 1.0, 'dice_weight': 1.0},
        'augmentation': {'enabled': True, 'horizontal_flip': 0.5,
                         'rotation_limit': 15, 'elastic': 0.3,
                         'brightness_contrast': 0.3},
        'output': {'save_dir': str(tmp_path / 'runs'),
                   'experiment_name': f'odd{img_size}',
                   'save_last': True, 'save_best': True},
        'seed': 5,
        'device': '',
        'tpu': {'compute_dtype': 'float32', 'data_parallel': 1},
    }
    cfg_path = tmp_path / 'cfg.yaml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    from unet_tpu.cli.train import main as train_main
    sys.argv = ['train', '--config', str(cfg_path), '--cache', str(blob)]
    try:
        history = train_main()
    finally:
        sys.argv = old
    assert np.isfinite(history['train_loss'][0])
    run = tmp_path / 'runs' / f'odd{img_size}'
    assert (run / 'weights' / 'last' / 'meta.json').exists()

    # ---- predict on the non-square source PNGs at the odd img_size;
    # masks must restore to the ORIGINAL (W, H) = (28, 40) ----
    from unet_tpu.cli.predict import main as predict_main
    preds = tmp_path / 'preds'
    sys.argv = ['predict', '--weights', str(run / 'weights' / 'last'),
                '--source', str(out / 'images'), '--output', str(preds),
                '--img-size', str(img_size), '--batch-size', '4',
                '--save-overlay']
    try:
        predict_main()
    finally:
        sys.argv = old
    masks = sorted(preds.glob('*_mask.png'))
    assert len(masks) == len(pngs)
    m = Image.open(masks[0])
    assert m.size == (28, 40)
    vals = set(np.unique(np.asarray(m)))
    assert vals <= {0, 255}
    assert Image.open(sorted(preds.glob('*_overlay.png'))[0]).size == (28, 40)
