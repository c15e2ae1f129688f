#!/usr/bin/env python
"""Thin wrapper so `python scripts/train.py` keeps working like the
reference layout; the implementation lives in unet_tpu.cli.train."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.cli.train import main

if __name__ == '__main__':
    main()
