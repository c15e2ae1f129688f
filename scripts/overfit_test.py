#!/usr/bin/env python
"""Thin wrapper; implementation in unet_tpu.cli.overfit."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.cli.overfit import run_overfit

if __name__ == '__main__':
    sys.exit(0 if run_overfit() else 1)
