#!/usr/bin/env python
"""Dump an UNTRAINED reference-torch checkpoint for same-init controls.

Instantiates the mounted reference model (/root/reference/unet/models)
at a fixed torch seed and saves its state_dict in the reference
checkpoint payload format (ref callbacks.py:185-196), so
``scripts/train.py --init-weights <out.pt>`` starts our framework from
bit-identical initial weights. This isolates training *dynamics*
(optimizer/loss/BN/aug/metric semantics) from the init-distribution
draw in the cross-framework control (docs/parity_r3/).

Usage:
  python scripts/dump_torch_init.py --output /tmp/torch_init.pt \
      --model attention_unet --base-features 8 [--seed 42]
"""

import argparse
import sys
from pathlib import Path

REF = Path('/root/reference')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--output', required=True)
    p.add_argument('--model', default='attention_unet',
                   choices=['unet', 'attention_unet'])
    p.add_argument('--n-channels', type=int, default=1)
    p.add_argument('--n-classes', type=int, default=2)
    p.add_argument('--base-features', type=int, default=8)
    p.add_argument('--bilinear', action='store_true', default=True)
    p.add_argument('--seed', type=int, default=42)
    args = p.parse_args()

    if not REF.exists():
        sys.exit('reference repo not mounted at /root/reference')
    sys.path.insert(0, str(REF))
    import torch

    from unet.models import AttentionUNet, UNet

    torch.manual_seed(args.seed)
    cls = AttentionUNet if args.model == 'attention_unet' else UNet
    m = cls(n_channels=args.n_channels, n_classes=args.n_classes,
            bilinear=args.bilinear, base_features=args.base_features)
    ckpt = {
        'epoch': -1,
        'model_state_dict': m.state_dict(),
        'metrics': {},
        'config': {'model': {'type': args.model,
                             'n_channels': args.n_channels,
                             'n_classes': args.n_classes,
                             'bilinear': args.bilinear,
                             'base_features': args.base_features,
                             'deep_supervision': False}},
    }
    torch.save(ckpt, args.output)
    n = sum(p.numel() for p in m.parameters())
    print(f'saved untrained {args.model} ({n} params, seed {args.seed}) '
          f'to {args.output}')


if __name__ == '__main__':
    main()
