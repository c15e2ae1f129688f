#!/usr/bin/env python
"""Download the Kaggle ``modaresimr/medical-image-segmentation`` dataset
(~40 GB) used for Task006_Lung training.

Counterpart of the reference's download toolkit (reference
toolkits/download_medical_segmentation.py): fetches via kagglehub,
optionally copies to ``--output``, optionally prints the directory tree
with ``--explore``. Requires ``kagglehub`` (and Kaggle credentials);
fails with instructions when missing.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

DATASET = 'modaresimr/medical-image-segmentation'


def print_tree(root: Path, max_depth: int = 3, max_entries: int = 20,
               _depth: int = 0) -> None:
    if _depth > max_depth:
        return
    entries = sorted(root.iterdir(), key=lambda p: (p.is_file(), p.name))
    for e in entries[:max_entries]:
        size = f' ({e.stat().st_size / 1e6:.1f} MB)' if e.is_file() else ''
        print('  ' * _depth + ('- ' if e.is_file() else '+ ') + e.name + size)
        if e.is_dir():
            print_tree(e, max_depth, max_entries, _depth + 1)
    if len(entries) > max_entries:
        print('  ' * _depth + f'... {len(entries) - max_entries} more')


def main():
    p = argparse.ArgumentParser(
        description=f'Download {DATASET} from Kaggle')
    p.add_argument('--output', type=str, default=None,
                   help='copy the dataset here (default: kagglehub cache)')
    p.add_argument('--explore', action='store_true',
                   help='print the downloaded directory tree')
    args = p.parse_args()

    try:
        import kagglehub
    except ImportError:
        print('error: kagglehub is not installed.\n'
              '  pip install kagglehub\n'
              'and place your Kaggle API token at ~/.kaggle/kaggle.json')
        sys.exit(1)

    print(f'Downloading {DATASET} (~40 GB, cached by kagglehub)...')
    path = Path(kagglehub.dataset_download(DATASET))
    print(f'Dataset at: {path}')

    if args.output:
        dst = Path(args.output)
        print(f'Copying to {dst} ...')
        shutil.copytree(path, dst, dirs_exist_ok=True)
        path = dst
        print('Copy complete.')

    if args.explore:
        print_tree(path)

    print('\nNext: convert to PNG slices with\n'
          f'  python toolkits/convert_medical_segmentation.py '
          f'--input {path} --task Task006 --output ./dataset')


if __name__ == '__main__':
    main()
