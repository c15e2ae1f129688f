#!/usr/bin/env python
"""Pallas implicit-GEMM conv vs XLA at the U-Net level shapes.

Methodology matches benchmarks/microbench.py: ops chained in one jitted
scan (amortizes the tunneled readback jitter), min-of-3, scalar-readback
sync. Run on an otherwise idle host or the numbers are garbage.

Usage: python benchmarks/conv_bench.py [--bwd]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    from unet_tpu.ops.pallas.conv3x3 import (
        conv3x3, conv3x3_bn_relu, conv3x3_reference, igemm_shapes_supported)

    enable_compilation_cache()
    bwd = '--bwd' in sys.argv
    print(f'backend: {jax.default_backend()} {jax.devices()}', flush=True)
    N = 32

    def timed(fn, x0):
        def chain(x):
            def b(c, _):
                return fn(c), ()
            return jax.lax.scan(b, x, None, length=N)[0] \
                .astype(jnp.float32).sum()
        jf = jax.jit(chain)
        float(jf(x0))

        def once(v):
            t0 = time.time()
            float(jf(v))
            return time.time() - t0
        return min(once(x0 * (1 + i * 1e-3)) for i in range(1, 4)) / N

    # (hw, cin, cout) at batch 8 — encoder conv2 and decoder conv1 shapes
    import os
    shapes = [(512, 64, 64), (512, 128, 64), (256, 128, 128),
              (256, 256, 128), (128, 256, 256), (64, 512, 512)]
    if os.environ.get('UNET_TPU_BENCH_SHAPES'):
        shapes = [tuple(int(v) for v in t.split('x')) for t in
                  os.environ['UNET_TPU_BENCH_SHAPES'].split(',')]
    for hw, ci, co in shapes:
        x = jnp.full((8, hw, hw, ci), 0.1, jnp.bfloat16)
        k = jnp.full((3, 3, ci, co), 1e-2, jnp.float32)
        if not igemm_shapes_supported(x.shape, k.shape):
            print(f'{hw}^2 {ci:4d}->{co:4d}: unsupported', flush=True)
            continue
        fl = 2 * 9 * ci * co * hw * hw * 8

        k2 = jnp.full((3, 3, co, ci), 1e-2, jnp.float32)

        def run(conv):
            if bwd:
                g = jax.jit(jax.grad(
                    lambda v: conv(v, k).astype(jnp.float32).sum()))
                return timed(lambda v: g(v) * 0.5, x), 2 * fl
            if co == ci:
                return timed(lambda v: conv(v, k) * 0.5, x), fl
            # chain back with a co->ci conv so the scan carry is stable
            fl2 = 2 * 9 * co * ci * hw * hw * 8
            return timed(lambda v: conv(conv(v, k), k2) * 0.5, x), fl + fl2

        dt_x, fx = run(conv3x3_reference)
        dt_p, fp = run(lambda v, kk: conv3x3(v, kk))
        tag = 'fwd+dx' if bwd else 'fwd'
        print(f'{hw}^2 {ci:4d}->{co:4d} {tag}: '
              f'xla {fx / dt_x / 1e12:6.1f}  pallas {fp / dt_p / 1e12:6.1f} '
              f'TFLOP/s  ({dt_x * 1e3:.2f} vs {dt_p * 1e3:.2f} ms)',
              flush=True)


if __name__ == '__main__':
    main()
