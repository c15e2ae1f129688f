#!/usr/bin/env python
"""Break down the on-device augmentation cost at training shape.

The r3 end-to-end throughput measurement (docs/DESIGN.md) showed the
train CLI sustaining 33.6 slices/s with augmentation on vs 67.9 with it
off at b8/512² — the aug program costs ~14 ms/image, half the epoch.
This bench isolates the contributors (composed warp gathers, elastic
field generation+blur, RNG draws, photometric tail) with the repo's
chained-scan methodology: one jitted lax.scan dispatch runs ITERS
augmentations back-to-back and a single scalar readback syncs — on the
tunneled backend block_until_ready does NOT reliably await execution
(see bench.py), and naive dispatch loops both mistime and, if the
process exits with work in flight, can wedge the remote server.

Usage: python benchmarks/aug_bench.py [--batch 32] [--size 512]
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 20
REPS = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--size', type=int, default=512)
    args = p.parse_args()
    n, hw = args.batch, args.size

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    from unet_tpu.data.augmentations import AugmentConfig, augment_batch

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.random((n, hw, hw, 1)).astype(np.float32))
    masks = jax.device_put((rng.random((n, hw, hw)) > 0.8
                            ).astype(np.int32))

    def chained(cfg):
        def chain(im, mk, seed):
            def body(carry, i):
                cim, cmk = carry
                key = jax.random.fold_in(jax.random.key(seed), i)
                oim, omk = augment_batch(cim, cmk, key, cfg)
                # renormalize so the carry stays in [0,1] across iters
                oim = jnp.clip(oim * cfg.std + cfg.mean, 0.0, 1.0)
                return (oim, omk), None
            (oim, omk), _ = jax.lax.scan(body, (im, mk),
                                         jnp.arange(ITERS))
            return oim.sum() + omk.sum()
        return jax.jit(chain)

    base = AugmentConfig()
    variants = {
        'full': base,
        'no_elastic': dataclasses.replace(base, p_elastic=0.0),
        'no_noise': dataclasses.replace(base, p_noise=0.0),
        'no_elastic_no_noise': dataclasses.replace(
            base, p_elastic=0.0, p_noise=0.0),
        'warp_only': dataclasses.replace(
            base, p_elastic=0.0, p_noise=0.0, p_brightness=0.0,
            p_dropout=0.0, p_grid=0.0),
        'photometric_only': dataclasses.replace(
            base, p_elastic=0.0, p_affine=0.0, p_hflip=0.0, p_vflip=0.0,
            p_grid=0.0),
    }
    print(f'augment_batch ({n}, {hw}, {hw}) x{ITERS} chained on '
          f'{jax.devices()[0].platform}', flush=True)
    results = {}
    for name, cfg in variants.items():
        run = chained(cfg)
        t0 = time.time()
        v = float(run(images, masks, np.uint32(0)))
        print(f'  {name:22s} compile+run {time.time() - t0:6.1f}s '
              f'(sum {v:.3e})', flush=True)
        best = float('inf')
        for r in range(REPS):
            t0 = time.time()
            float(run(images, masks, np.uint32(r + 1)))
            best = min(best, (time.time() - t0) / ITERS)
        results[name] = best * 1e3
        print(f'  {name:22s} {best * 1e3:8.2f} ms/batch '
              f'({best * 1e3 / n:6.3f} ms/image)', flush=True)
    full = results['full']
    print(f"  elastic ~{full - results['no_elastic']:.2f} ms, "
          f"noise ~{full - results['no_noise']:.2f} ms, "
          f"warp-only {results['warp_only']:.2f} ms")


if __name__ == '__main__':
    main()
