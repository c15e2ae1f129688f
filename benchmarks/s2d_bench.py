#!/usr/bin/env python
"""Width-space-to-depth conv vs plain XLA at the U-Net C<=128 shapes.

Methodology matches benchmarks/conv_bench.py: ops chained in one jitted
scan (amortizes the tunneled readback jitter), min-of-3, scalar-readback
sync. Run on an otherwise idle host or the numbers are garbage.

Usage: python benchmarks/s2d_bench.py [--bwd]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    from unet_tpu.ops.s2d import conv3x3_s2d_w

    enable_compilation_cache()
    bwd = '--bwd' in sys.argv
    full = '--full' in sys.argv
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

    def ref(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    import os
    # (hw, cin, cout) at batch 8 — every logical-C<=128 conv in the net
    shapes = [(512, 64, 64), (512, 128, 64), (256, 64, 128),
              (256, 128, 64), (256, 128, 128), (256, 256, 128)]
    if os.environ.get('UNET_TPU_BENCH_SHAPES'):
        shapes = [tuple(int(v) for v in t.split('x')) for t in
                  os.environ['UNET_TPU_BENCH_SHAPES'].split(',')]
    for hw, ci, co in shapes:
        x = jnp.full((8, hw, hw, ci), 0.1, jnp.bfloat16)
        k = jnp.full((3, 3, ci, co), 1e-2, jnp.float32)
        k2 = jnp.full((3, 3, co, ci), 1e-2, jnp.float32)
        fl = 2 * 9 * ci * co * hw * hw * 8  # logical FLOPs

        def run(conv):
            if full:
                # fwd + dgrad + wgrad (what one training step pays)
                def g(v):
                    dx, dk = jax.grad(
                        lambda vv, kk: conv(vv, kk)
                        .astype(jnp.float32).sum(), argnums=(0, 1))(v, k)
                    return dx * 0.5 + dk.astype(v.dtype).sum() * 1e-6
                return timed(g, x), 3 * fl
            if bwd:
                g = jax.jit(jax.grad(
                    lambda v: conv(v, k).astype(jnp.float32).sum()))
                return timed(lambda v: g(v) * 0.5, x), 2 * fl
            if co == ci:
                return timed(lambda v: conv(v, k) * 0.5, x), fl
            fl2 = 2 * 9 * co * ci * hw * hw * 8
            return timed(lambda v: conv(conv(v, k), k2) * 0.5, x), fl + fl2

        dt_x, fx = run(ref)
        dt_d, fd = run(lambda v, kk: conv3x3_s2d_w(v, kk, 'dense'))
        dt_s, fs = run(lambda v, kk: conv3x3_s2d_w(v, kk, 'split'))
        tag = 'fwd+dx+dk' if full else ('fwd+dx' if bwd else 'fwd')
        print(f'{hw}^2 {ci:4d}->{co:4d} {tag}: '
              f'xla {dt_x * 1e3:6.2f}  s2d-dense {dt_d * 1e3:6.2f}  '
              f's2d-split {dt_s * 1e3:6.2f} ms  '
              f'(logical {fx / dt_x / 1e12:5.1f} / {fd / dt_d / 1e12:5.1f} '
              f'/ {fs / dt_s / 1e12:5.1f} TFLOP/s)',
              flush=True)


if __name__ == '__main__':
    main()
