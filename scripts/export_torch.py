#!/usr/bin/env python
"""Thin wrapper so `python scripts/export_torch.py` matches the other
script entry points; the implementation lives in
unet_tpu.cli.export_torch."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.cli.export_torch import main

if __name__ == '__main__':
    main()
