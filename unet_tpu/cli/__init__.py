"""Command-line entry points (console_scripts: unet-train, unet-predict,
unet-overfit-test, unet-export-torch, unet-serve — superset of the
reference's unet-train/unet-predict, reference setup.py:56-61)."""
