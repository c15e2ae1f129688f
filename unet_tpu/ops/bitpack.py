"""Bit-packed binary-mask wire format for host->device transfers.

The training input pipeline ships uint8 images and binary masks to the
device every step (cli/train.py). A {0,1} mask stored one-byte-per-pixel
costs as much wire as the image itself — at 512² that is 0.26 MB of a
0.52 MB per-slice payload, and the measured end-to-end train loop on
the tunneled TPU (26 MB/s host link) is transfer-bound (docs/DESIGN.md
"End-to-end input pipeline"). Packing masks to 1 bit/pixel on the host
(one C-speed ``np.packbits`` call per super-batch) cuts the wire
payload to 9/16 and moves the pipeline back to compute-bound; the
device-side unpack is a trivial VPU shift-and-mask that costs one HBM
round-trip of the unpacked mask (~40 µs per 512² super-batch — noise
next to the ~1 ms it saves on the wire per slice).

The reference has no analogue (torch DataLoader moves float32 tensors
over PCIe, ref unet/data/dataset.py:60-88); this is a TPU-native
bandwidth optimization for the thin-host-link regime.
"""

import numpy as np

__all__ = ['pack_masks', 'unpack_masks']


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """Host side: pack a {0,1} mask along its last axis.

    (..., W) uint8/bool/int -> (..., ceil(W/8)) uint8, big-endian bit
    order (numpy's packbits default: first pixel -> MSB).
    """
    return np.packbits(np.asarray(masks, np.uint8), axis=-1)


def unpack_masks(packed, width: int):
    """Device side (jit-safe) inverse: (..., ceil(W/8)) uint8 ->
    (..., width) int32 in {0, 1}."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    out = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return out[..., :width].astype(jnp.int32)


def pack_masks_device(masks):
    """Device side (jit-safe) pack for the device->host direction:
    (..., W) {0,1} int/bool -> (..., ceil(W/8)) uint8, MSB-first (same
    bit order as ``pack_masks``/numpy). Used by the predict/serve
    readback wire: thresholding runs on device and only 1-bit masks
    cross the link (32x less readback than f32 probabilities at 512²
    — which otherwise dominates the tunneled link at ~1 MB per slice)."""
    import jax.numpy as jnp

    w = masks.shape[-1]
    pad = (-w) % 8
    m = masks.astype(jnp.uint32)
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    m = m.reshape(m.shape[:-1] + (m.shape[-1] // 8, 8))
    weights = jnp.uint32(1) << jnp.arange(7, -1, -1, dtype=jnp.uint32)
    return (m * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_masks_host(packed: np.ndarray, width: int) -> np.ndarray:
    """Host side inverse of ``pack_masks_device``: (..., ceil(W/8))
    uint8 -> (..., width) uint8 in {0, 1} (one C-speed unpackbits)."""
    out = np.unpackbits(np.asarray(packed, np.uint8), axis=-1)
    return out[..., :width]
