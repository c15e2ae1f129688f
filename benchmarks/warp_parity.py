#!/usr/bin/env python
"""Real-hardware parity check for the Pallas banded warp kernel.

The golden tests (tests/test_pallas_warp.py) run the kernel in interpret
mode off-TPU; this script re-runs the same exactness contract ON the TPU
at training shape (512²) so the "masks bit-identical, images <=2 f32 ULP"
claim is hardware-verified before the kernel is made the TPU default.

Checks, at (8, 512, 512):
  1. coherent rotation±15° + wobble grid (the design case)
  2. scattered out-of-range coords (zero border, worst-case row window)
  3. exact .5 ties (round-half-even nearest-mask rule)
  4. full augment_batch wiring with a shared key (XLA vs kernel path)

Usage: [UNET_TPU_WARP_TILED_GATHER=1] python benchmarks/warp_parity.py
Prints one PASS/FAIL line per check and exits nonzero on any failure.
"""

import os
import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N, H, W = 8, 512, 512


def ulp_dist(got, want):
    import numpy as np
    got, want = np.asarray(got), np.asarray(want)
    ulp = np.abs(got.view(np.int32).astype(np.int64)
                 - want.view(np.int32).astype(np.int64))
    return np.where(got == want, 0, ulp).max()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    from unet_tpu.data.augmentations import (AugmentConfig,
                                             _grid_sample_fused,
                                             augment_batch)
    from unet_tpu.ops.pallas.warp import grid_sample_fused_pallas

    print(f'backend: {jax.default_backend()}, '
          f'tiled={os.environ.get("UNET_TPU_WARP_TILED_GATHER")}',
          flush=True)
    rng = np.random.default_rng(zlib.crc32(b'warp-parity'))
    img = jnp.asarray(rng.random((N, H, W, 1)), jnp.float32)
    msk = jnp.asarray((rng.random((N, H, W)) > 0.7).astype(np.int32))

    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None] - (H - 1) / 2
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :] - (W - 1) / 2
    a = jnp.linspace(-0.26, 0.26, N)[:, None, None]
    grids = {
        'rotation': (
            jnp.cos(a) * yy + jnp.sin(a) * xx + (H - 1) / 2
            + jnp.asarray(rng.normal(0, 0.7, (N, H, W)), jnp.float32),
            -jnp.sin(a) * yy + jnp.cos(a) * xx + (W - 1) / 2
            + jnp.asarray(rng.normal(0, 0.7, (N, H, W)), jnp.float32)),
        'scattered': (
            jnp.asarray(rng.uniform(-6, H + 6, (N, H, W)), jnp.float32),
            jnp.asarray(rng.uniform(-6, W + 6, (N, H, W)), jnp.float32)),
        'half_ties': (
            jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)
                             [None, :, None], (N, H, W)) + 0.5,
            jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)
                             [None, None, :], (N, H, W)) + 0.5),
    }

    failures = 0
    for name, (rows, cols) in grids.items():
        want_i, want_m = jax.jit(_grid_sample_fused)(img, msk, rows, cols)
        got_i, got_m = jax.jit(grid_sample_fused_pallas)(
            img, msk, rows, cols)
        # scalar readbacks force real sync on this backend
        iu = ulp_dist(got_i, want_i)
        mdiff = int(np.sum(np.asarray(got_m) != np.asarray(want_m)))
        ok = iu <= 2 and mdiff == 0
        failures += not ok
        print(f'{"PASS" if ok else "FAIL"} {name}: image max ULP {iu}, '
              f'mask mismatches {mdiff}', flush=True)

    # full augment_batch wiring (same key both paths; env gate is read at
    # trace time so the unjitted function is used)
    raw = augment_batch.__wrapped__
    cfg = AugmentConfig()
    key = jax.random.key(123)
    prev = os.environ.pop('UNET_TPU_PALLAS_WARP', None)
    os.environ['UNET_TPU_PALLAS_WARP'] = '0'  # force XLA path (default
    # is ON on TPU since r4, so popping the var is not enough)
    want_i, want_m = jax.jit(
        lambda a_, b_: raw(a_, b_, key, cfg))(img, msk)
    os.environ['UNET_TPU_PALLAS_WARP'] = '1'
    got_i, got_m = jax.jit(
        lambda a_, b_: raw(a_, b_, key, cfg))(img, msk)
    if prev is None:
        del os.environ['UNET_TPU_PALLAS_WARP']
    else:
        os.environ['UNET_TPU_PALLAS_WARP'] = prev
    adiff = float(np.abs(np.asarray(got_i) - np.asarray(want_i)).max())
    mdiff = int(np.sum(np.asarray(got_m) != np.asarray(want_m)))
    ok = adiff <= 3e-7 and mdiff == 0
    failures += not ok
    print(f'{"PASS" if ok else "FAIL"} augment_batch: image max abs diff '
          f'{adiff:.2e} (bound 3e-7), mask mismatches {mdiff}', flush=True)
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
