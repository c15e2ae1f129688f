from unet_tpu.ops.resize import (
    pad_to_match,
    resize_bilinear_align_corners,
    resize_nearest,
    upsample2x_align_corners,
)

__all__ = [
    'resize_bilinear_align_corners', 'resize_nearest',
    'upsample2x_align_corners', 'pad_to_match',
]
