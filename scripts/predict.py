#!/usr/bin/env python
"""Thin wrapper; implementation in unet_tpu.cli.predict."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.cli.predict import main

if __name__ == '__main__':
    main()
