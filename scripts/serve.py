#!/usr/bin/env python
"""Launcher shim for the batched inference server (unet_tpu/cli/serve.py),
mirroring the other scripts/ entry points."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.cli.serve import main  # noqa: E402

if __name__ == '__main__':
    main()
