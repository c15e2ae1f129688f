"""Bit-packed mask wire format: exact round-trip on every shape the
pipeline ships (super-batches, loader batches, odd widths)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unet_tpu.ops.bitpack import pack_masks, unpack_masks  # noqa: E402


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(4, 32, 32), (2, 3, 16, 16), (1, 512), (5, 7),
                  (3, 8, 24)]:
        m = (rng.random(shape) > 0.7).astype(np.uint8)
        p = pack_masks(m)
        assert p.dtype == np.uint8
        assert p.shape == shape[:-1] + ((shape[-1] + 7) // 8,)
        out = np.asarray(unpack_masks(p, shape[-1]))
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, m)


def test_pack_unpack_odd_width():
    rng = np.random.default_rng(1)
    for w in (1, 5, 9, 13):
        m = (rng.random((2, 4, w)) > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(unpack_masks(pack_masks(m), w)), m)


def test_unpack_is_jittable():
    import jax

    m = (np.random.default_rng(2).random((2, 16, 16)) > 0.6
         ).astype(np.uint8)
    p = pack_masks(m)
    out = jax.jit(lambda x: unpack_masks(x, 16))(p)
    np.testing.assert_array_equal(np.asarray(out), m)


def test_wire_size_ratio():
    """The point of the format: a (B, H, W) mask ships at 1/8 the bytes."""
    m = np.zeros((8, 512, 512), np.uint8)
    assert pack_masks(m).nbytes * 8 == m.nbytes
