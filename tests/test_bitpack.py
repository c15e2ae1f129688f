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


def test_device_pack_host_unpack_roundtrip():
    """Device->host direction (predict/serve readback wire): jit-side
    pack_masks_device round-trips through unpack_masks_host for widths
    that are and aren't multiples of 8."""
    import jax
    import numpy as np
    from unet_tpu.ops.bitpack import pack_masks_device, unpack_masks_host

    rng = np.random.default_rng(0)
    for w in (8, 50, 128, 36):
        m = (rng.random((3, 5, w)) > 0.7).astype(np.uint8)
        packed = np.asarray(jax.jit(pack_masks_device)(m))
        assert packed.shape == (3, 5, (w + 7) // 8)
        np.testing.assert_array_equal(unpack_masks_host(packed, w), m)
        # bit order matches numpy packbits (the host->device direction)
        np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))


def test_predict_masks_step_matches_host_threshold():
    """make_predict_masks_step (device threshold + pack) must equal the
    host pipeline (probs readback + numpy threshold) exactly."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from unet_tpu.models import UNet
    from unet_tpu.ops.bitpack import unpack_masks_host
    from unet_tpu.train import create_optimizer, init_train_state
    from unet_tpu.train.trainer import (make_predict_masks_step,
                                        make_predict_step_u8)

    model = UNet(base_features=4)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 16, 16, 1)),
                             create_optimizer(1e-3))
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 16, 16, 1)).astype(np.uint8)
    thrs = np.asarray([0.3, 0.5, 0.7], np.float32)

    probs = np.asarray(jax.jit(make_predict_step_u8(model))(
        state.params, state.batch_stats, u8))
    packed = np.asarray(jax.jit(make_predict_masks_step(model))(
        state.params, state.batch_stats, u8, thrs))
    assert packed.shape == (3, 2, 16, 2)
    for ti, t in enumerate(thrs):
        want = (probs[..., 1] > t).astype(np.uint8)
        got = unpack_masks_host(packed[ti], 16)
        np.testing.assert_array_equal(got, want)
