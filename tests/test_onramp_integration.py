"""Full real-data onramp rehearsed as ONE path: synthetic NIfTI+pkl
task -> toolkits converter CLI -> native/python slice cache -> train
CLI epoch. The three stages are unit-tested separately elsewhere
(test_toolkits, test_data, test_cli); this asserts the contracts BETWEEN
them — file naming, stats/file_list consistency, split membership
parity between the cache and direct-PNG datasets, and the sample
counts the trainer actually sees (ref pipeline: toolkits/convert_
medical_segmentation.py -> scripts/train.py, SURVEY.md §7)."""

import json
import sys
import zipfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))
# flat module import (like test_toolkits) rather than the 'toolkits.'
# package form: other tests put /root/reference on sys.path, which also
# has a namespace-package 'toolkits' and could win the resolution
sys.path.insert(0, str(REPO / 'toolkits'))

from test_toolkits import _make_gt_pkl, write_nifti1  # noqa: E402


def test_convert_cache_train_onramp(tmp_path):
    rng = np.random.default_rng(3)

    # ---- a multi-volume task in the Kaggle wire format: CT.zip of
    # NIfTI volumes + GroundTruth/*.pkl, digit-named cases (the split's
    # digit-sort quirk operates on these) ----
    task = tmp_path / 'src' / 'Task006_Lung'
    gt = task / 'GroundTruth'
    gt.mkdir(parents=True)
    shape = (24, 24, 6)
    n_vols = 8
    nii_dir = tmp_path / 'nii'
    nii_dir.mkdir()
    with zipfile.ZipFile(task / 'CT.zip', 'w') as zf:
        for v in range(1, n_vols + 1):
            ct = (rng.standard_normal(shape) * 300).astype(np.int16)
            write_nifti1(nii_dir / f'{v}.nii', ct)
            zf.write(nii_dir / f'{v}.nii', f'{v}.nii')
            # tumor on slices 1, 3, 4 of every volume
            _make_gt_pkl(gt / f'{v}.pkl', shape,
                         [(slice(4, 14), slice(4, 14), slice(1, 2)),
                          (slice(2, 12), slice(6, 16), slice(3, 5))])

    # ---- stage 1: converter CLI (writes dataset_stats.json +
    # file_list.txt alongside the PNGs) ----
    from convert_medical_segmentation import main as convert_main
    out = tmp_path / 'dataset'
    argv = ['convert', '--input', str(tmp_path / 'src'),
            '--output', str(out), '--empty-ratio', '0.5', '--seed', '7']
    old = sys.argv
    sys.argv = argv
    try:
        convert_main()
    finally:
        sys.argv = old

    stats = json.loads((out / 'dataset_stats.json').read_text())
    file_list = (out / 'file_list.txt').read_text().split()
    on_disk = sorted(p.name for p in (out / 'images').glob('*.png'))
    t = stats['tasks'][0]
    assert t['volumes'] == n_vols
    assert t['slices_with_label'] == 3 * n_vols
    assert t['saved_slices'] == stats['num_files'] == len(file_list)
    assert sorted(file_list) == on_disk
    assert sorted(p.name for p in (out / 'labels').glob('*.png')) == on_disk

    # ---- stage 2: slice cache over the converted corpus ----
    from unet_tpu.data.cache import CachedSliceDataset, build_cache
    from unet_tpu.data.dataset import SliceDataset
    blob = tmp_path / 'cache.bin'
    build_cache(out, blob, img_size=32)
    meta = json.loads(Path(str(blob) + '.json').read_text())
    assert meta['files'] == on_disk

    # split membership parity: the cache dataset must assign exactly
    # the files the direct-PNG dataset assigns (same seed/algorithm)
    for split in ('train', 'val'):
        cached = CachedSliceDataset(blob, split, val_ratio=0.25, seed=11)
        direct = SliceDataset(out, split, img_size=32, val_ratio=0.25,
                              seed=11)
        assert cached.files == direct.files
        # and serve bit-identical pixels for the same index (the native
        # builder reproduces Pillow's exact resampling — see
        # tests/test_data.py::test_slice_cache_native_and_python)
        ci, cm = cached.load_raw(0)
        di, dm = direct.load_raw(0)
        np.testing.assert_array_equal(ci, di)
        np.testing.assert_array_equal(cm, dm)

    n_train = len(CachedSliceDataset(blob, 'train', val_ratio=0.25,
                                     seed=11))
    n_val = len(CachedSliceDataset(blob, 'val', val_ratio=0.25, seed=11))
    assert n_train + n_val == t['saved_slices']

    # ---- stage 3: one training epoch through the CLI on the cache ----
    from unet_tpu.cli.train import main as train_main
    cfg = {
        'model': {'type': 'unet', 'n_channels': 1, 'n_classes': 2,
                  'bilinear': True, 'base_features': 4,
                  'deep_supervision': False},
        'data': {'root': str(out), 'img_size': 32, 'val_ratio': 0.25,
                 'batch_size': 4, 'num_workers': 2},
        'train': {'epochs': 1, 'lr': 0.001, 'weight_decay': 0.0001,
                  'grad_clip': 1.0, 'accumulation_steps': 2},
        'scheduler': {'type': 'cosine_annealing', 'min_lr': 1e-6},
        'ema': {'enabled': False},
        'early_stopping': {'enabled': False,
                           'monitor': 'class_dice.tumor', 'mode': 'max'},
        'loss': {'type': 'dice_bce', 'balanced_class_weight': 0.5,
                 'ce_weight': 1.0, 'dice_weight': 1.0},
        'augmentation': {'enabled': True, 'horizontal_flip': 0.5,
                         'rotation_limit': 15, 'elastic': 0.0,
                         'brightness_contrast': 0.3},
        'output': {'save_dir': str(tmp_path / 'runs'),
                   'experiment_name': 'onramp', 'save_last': True,
                   'save_best': True},
        'seed': 11,
        'device': '',
        'tpu': {'compute_dtype': 'float32', 'data_parallel': 1},
    }
    import yaml
    cfg_path = tmp_path / 'cfg.yaml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    argv = ['train', '--config', str(cfg_path), '--cache', str(blob)]
    sys.argv = argv
    try:
        history = train_main()
    finally:
        sys.argv = old

    assert len(history['train_loss']) == 1
    assert np.isfinite(history['train_loss'][0])
    run = tmp_path / 'runs' / 'onramp'
    assert (run / 'weights' / 'last' / 'meta.json').exists()
    meta = json.loads((run / 'weights' / 'last' / 'meta.json').read_text())
    # the trainer saw exactly the cache's train split: batch 4,
    # drop_last microbatches, accumulation 2 (+ tail flush)
    n_micro = n_train // 4
    assert meta['step'] == (n_micro + 1) // 2
