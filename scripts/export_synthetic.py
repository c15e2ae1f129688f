#!/usr/bin/env python
"""Export the synthetic slice dataset to reference-format PNGs.

Writes ``out/{images,labels}/{volume}_slice_{i:04d}.png`` — the exact
directory/naming contract both this framework's SliceDataset and the
reference's LungTumorDataset consume (ref unet/data/dataset.py:75-97,
filenames from toolkits/convert_medical_segmentation.py:436). This is
the bridge for the cross-framework control run (docs/parity_r3/): the
mounted torch reference and this framework train on byte-identical
files with the same volume-split seed, so val tumor-Dice trajectories
are directly comparable.

Usage:
  python scripts/export_synthetic.py --output /tmp/parity_data \
      --volumes 24 --slices 6 --img-size 128 [--seed 42]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--output', required=True)
    p.add_argument('--volumes', type=int, default=24)
    p.add_argument('--slices', type=int, default=6)
    p.add_argument('--img-size', type=int, default=128)
    p.add_argument('--seed', type=int, default=42)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from unet_tpu.data.dataset import SyntheticSliceDataset

    ds = SyntheticSliceDataset(
        num_volumes=args.volumes, slices_per_volume=args.slices,
        img_size=args.img_size, split='all', seed=args.seed)
    out = Path(args.output)
    (out / 'images').mkdir(parents=True, exist_ok=True)
    (out / 'labels').mkdir(parents=True, exist_ok=True)
    n_tumor = 0
    for i in range(len(ds)):
        img, msk = ds.load(i)
        name = ds.files[i]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            out / 'images' / name)
        # labels are {0, 255} like the converter writes (binarized back
        # by the >127 load rule on both sides)
        Image.fromarray((msk.astype(np.uint8) * 255)).save(
            out / 'labels' / name)
        n_tumor += int(msk.any())
    print(f'wrote {len(ds)} slices ({n_tumor} with tumor) to {out}')


if __name__ == '__main__':
    main()
