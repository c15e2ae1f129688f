#!/usr/bin/env python
"""Convert the Kaggle medical-image-segmentation dataset to PNG slices.

Produces the paired ``dataset/{images,labels}/{task}_{case}_slice_{i:04d}.png``
layout consumed by ``unet_tpu.data.SliceDataset`` — functionally
equivalent to the reference converter
(reference toolkits/convert_medical_segmentation.py): CT volumes come
from ``TaskXXX/CT.zip`` NIfTI files, labels from sparse ``GroundTruth/
*.pkl`` segment objects; slices with fewer than ``--min-pixels`` labeled
pixels are dropped and a random ``--empty-ratio`` fraction of empty
slices is kept; labels are binarized to {0, 255}; CT intensity is
windowed (center/width) or percentile-clipped to uint8; a
``dataset_stats.json`` and ``file_list.txt`` are written.

Implementation differences from the reference: pickles are loaded with a
tolerant ``pickle.Unpickler`` subclass (no fake-module injection into
``sys.modules``), and NIfTI parsing uses nibabel when present or the
bundled pure-numpy reader (toolkits/nifti.py) otherwise.

CLI: --input --output --task --explore --window-center --window-width
     --empty-ratio --tumor-only --min-pixels --seed
"""

from __future__ import annotations

import argparse
import io
import json
import pickle
import random
import sys
import zipfile
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:
    print('error: Pillow is required (pip install Pillow)')
    sys.exit(1)

sys.path.insert(0, str(Path(__file__).resolve().parent))


# ---------------------------------------------------------------------------
# Tolerant unpickling of third-party 'evalseg' objects
# ---------------------------------------------------------------------------

class _Stub:
    """Duck-typed stand-in for any class we don't have: keeps the
    pickled attribute dict and nothing else."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__['_state'] = state


class TolerantUnpickler(pickle.Unpickler):
    """Resolves classes from missing modules (evalseg and friends) to
    ``_Stub`` so the data payload can be recovered without the original
    package installed."""

    def find_class(self, module: str, name: str):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {'__module__': module})


def load_ground_truth_pkl(pkl_path: Path) -> np.ndarray:
    """Rebuild the dense uint8 label volume from the sparse per-segment
    ROI representation: each segment carries a tuple-of-slices ``roi``
    into the full volume plus its ``data`` block; overlapping segments
    combine with ``np.maximum``."""
    with open(pkl_path, 'rb') as f:
        obj = TolerantUnpickler(f).load()
    volume = np.zeros(tuple(obj.shape), dtype=np.uint8)
    for seg in getattr(obj, 'segments', []):
        roi = getattr(seg, 'roi', None)
        data = getattr(seg, 'data', None)
        if roi is None or data is None:
            continue
        volume[tuple(roi)] = np.maximum(volume[tuple(roi)],
                                        np.asarray(data, np.uint8))
    return volume


# ---------------------------------------------------------------------------
# Intensity normalization
# ---------------------------------------------------------------------------

def normalize_image(data: np.ndarray, window_center: Optional[float] = None,
                    window_width: Optional[float] = None,
                    percentile_clip: Tuple[float, float] = (0.5, 99.5)
                    ) -> np.ndarray:
    """Map raw CT intensities to uint8 [0, 255]: explicit window
    center/width when given, else percentile clipping; data already in
    [0, 1] or [0, 255] passes through with scaling only."""
    data = data.astype(np.float32)
    lo, hi = float(data.min()), float(data.max())
    if lo >= 0 and hi <= 1.0:
        return (data * 255).astype(np.uint8)
    if lo >= 0 and hi <= 255:
        return data.astype(np.uint8)
    if window_center is not None and window_width is not None:
        lo = window_center - window_width // 2
        hi = window_center + window_width // 2
    else:
        lo = float(np.percentile(data, percentile_clip[0]))
        hi = float(np.percentile(data, percentile_clip[1]))
        if hi - lo < 1e-6:
            return np.zeros(data.shape, np.uint8)
    data = np.clip(data, lo, hi)
    return ((data - lo) / (hi - lo) * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# NIfTI loading (nibabel if present, bundled reader otherwise)
# ---------------------------------------------------------------------------

def load_nifti_bytes(raw: bytes) -> np.ndarray:
    try:
        import tempfile

        import nibabel as nib
        with tempfile.NamedTemporaryFile(suffix='.nii') as tmp:
            tmp.write(raw)
            tmp.flush()
            return np.asarray(nib.load(tmp.name).get_fdata(),
                              dtype=np.float32)
    except ImportError:
        from nifti import load_nifti
        return load_nifti(raw)


# ---------------------------------------------------------------------------
# Dataset walking
# ---------------------------------------------------------------------------

def explore_dataset(src: Path) -> Dict[str, Any]:
    info: Dict[str, Any] = {'tasks': [], 'total_volumes': 0}
    for task_dir in sorted(p for p in Path(src).iterdir()
                           if p.is_dir() and p.name.startswith('Task')):
        ct_zip = task_dir / 'CT.zip'
        gt_dir = task_dir / 'GroundTruth'
        if not ct_zip.exists() or not gt_dir.exists():
            continue
        entry = {
            'name': task_dir.name,
            'path': str(task_dir),
            'num_labeled': len(list(gt_dir.glob('*.pkl'))),
            'num_total_ct': 0,
            'labels': {},
        }
        meta = task_dir / 'metadata.json'
        if meta.exists():
            try:
                m = json.loads(meta.read_text())
                entry['labels'] = m.get('labels', {})
                entry['description'] = m.get('description', '')
            except json.JSONDecodeError:
                pass
        try:
            with zipfile.ZipFile(ct_zip) as zf:
                entry['num_total_ct'] = sum(
                    1 for n in zf.namelist()
                    if n.endswith(('.nii', '.nii.gz')))
        except zipfile.BadZipFile:
            pass
        info['tasks'].append(entry)
        info['total_volumes'] += entry['num_labeled']
    return info


def _find_ct_member(zf: zipfile.ZipFile, case_id: str) -> Optional[str]:
    candidates = [n for n in zf.namelist()
                  if n.endswith(('.nii', '.nii.gz'))
                  and Path(n).name.split('.')[0] == case_id]
    return candidates[0] if candidates else None


def convert_task(task_dir: Path, out_dir: Path,
                 window_center: Optional[float],
                 window_width: Optional[float], empty_ratio: float,
                 tumor_only: bool, min_pixels: int, seed: int
                 ) -> Dict[str, Any]:
    rng = random.Random(seed)
    images_out = out_dir / 'images'
    labels_out = out_dir / 'labels'
    images_out.mkdir(parents=True, exist_ok=True)
    labels_out.mkdir(parents=True, exist_ok=True)

    task_name = task_dir.name
    stats = {'task': task_name, 'total_slices': 0, 'saved_slices': 0,
             'slices_with_label': 0, 'slices_filtered_small': 0,
             'empty_slices_saved': 0, 'empty_slices_skipped': 0,
             'volumes': 0, 'files': []}

    def save_slice(img2d, lbl2d, case_id, idx):
        name = f'{task_name}_{case_id}_slice_{idx:04d}.png'
        Image.fromarray(normalize_image(img2d, window_center,
                                        window_width)).save(
            images_out / name)
        Image.fromarray(((lbl2d > 0) * 255).astype(np.uint8)).save(
            labels_out / name)
        stats['saved_slices'] += 1
        stats['files'].append(name)

    with zipfile.ZipFile(task_dir / 'CT.zip') as zf:
        for pkl_path in sorted((task_dir / 'GroundTruth').glob('*.pkl')):
            case_id = pkl_path.stem
            member = _find_ct_member(zf, case_id)
            if member is None:
                print(f'  warn: no CT volume for case {case_id}')
                continue
            img = load_nifti_bytes(zf.read(member))
            lbl = load_ground_truth_pkl(pkl_path)
            if img.ndim == 4:
                img = img[..., 0]
            if img.shape != lbl.shape:
                print(f'  warn: shape mismatch CT={img.shape} '
                      f'label={lbl.shape} (cropping to min)')
                m = tuple(min(a, b) for a, b in zip(img.shape, lbl.shape))
                img, lbl = img[:m[0], :m[1], :m[2]], lbl[:m[0], :m[1], :m[2]]

            stats['volumes'] += 1
            n_slices = img.shape[2]
            stats['total_slices'] += n_slices
            empties: List[int] = []
            for i in range(n_slices):
                n_label = int(np.sum(lbl[:, :, i] > 0))
                if n_label > 0 and n_label >= min_pixels:
                    stats['slices_with_label'] += 1
                    save_slice(img[:, :, i], lbl[:, :, i], case_id, i)
                else:
                    if 0 < n_label < min_pixels:
                        stats['slices_filtered_small'] += 1
                    empties.append(i)
            if not tumor_only and empties and empty_ratio > 0:
                keep = rng.sample(empties,
                                  int(len(empties) * empty_ratio))
                for i in keep:
                    save_slice(img[:, :, i], lbl[:, :, i], case_id, i)
                    stats['empty_slices_saved'] += 1
                stats['empty_slices_skipped'] += len(empties) - len(keep)
            else:
                stats['empty_slices_skipped'] += len(empties)
    return stats


def main():
    p = argparse.ArgumentParser(
        description='Convert Kaggle medical-segmentation data to PNG')
    p.add_argument('--input', type=str, required=True,
                   help='dataset root containing TaskXXX dirs')
    p.add_argument('--output', type=str, default='./dataset')
    p.add_argument('--task', type=str, default='Task006',
                   help='task name prefix to convert (e.g. Task006)')
    p.add_argument('--explore', action='store_true',
                   help='print dataset structure and exit')
    p.add_argument('--window-center', type=float, default=None)
    p.add_argument('--window-width', type=float, default=None)
    p.add_argument('--empty-ratio', type=float, default=0.1,
                   help='fraction of empty slices to keep')
    p.add_argument('--tumor-only', action='store_true')
    p.add_argument('--min-pixels', type=int, default=0,
                   help='minimum labeled pixels to keep a slice')
    p.add_argument('--seed', type=int, default=42)
    args = p.parse_args()

    src = Path(args.input)
    if args.explore:
        info = explore_dataset(src)
        print(json.dumps(info, indent=2, ensure_ascii=False))
        return

    tasks = [d for d in sorted(src.iterdir())
             if d.is_dir() and d.name.startswith(args.task)]
    if not tasks:
        print(f'No task dirs matching {args.task!r} under {src}')
        sys.exit(1)

    out_dir = Path(args.output)
    all_stats = []
    for task_dir in tasks:
        print(f'Converting {task_dir.name} ...')
        stats = convert_task(task_dir, out_dir, args.window_center,
                             args.window_width, args.empty_ratio,
                             args.tumor_only, args.min_pixels, args.seed)
        print(f"  volumes={stats['volumes']} "
              f"saved={stats['saved_slices']} "
              f"labeled={stats['slices_with_label']} "
              f"empty_kept={stats['empty_slices_saved']}")
        all_stats.append(stats)

    files = sorted(sum((s.pop('files') for s in all_stats), []))
    (out_dir / 'dataset_stats.json').write_text(
        json.dumps({'tasks': all_stats, 'num_files': len(files)}, indent=2))
    (out_dir / 'file_list.txt').write_text('\n'.join(files) + '\n')
    print(f'Done: {len(files)} slice pairs in {out_dir}')


if __name__ == '__main__':
    main()
