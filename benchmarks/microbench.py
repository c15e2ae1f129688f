#!/usr/bin/env python
"""Microbenchmarks: per-op ceilings of the current device.

Measures matmul TFLOP/s, 3x3 conv TFLOP/s at U-Net level shapes,
elementwise HBM bandwidth, and host->device transfer rate — the numbers
that explain the full-model throughput (see docs/DESIGN.md). Methodology
matches bench.py: ops chained inside one jitted scan with varying data,
scalar-readback sync.

Usage: python benchmarks/microbench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _time_once(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()

    print(f'backend: {jax.default_backend()} {jax.devices()}', flush=True)
    N = 64

    # the tunneled device->host readback adds 50-500ms of jitter per
    # call; measure it so readers can subtract, and take min-of-3
    tiny = jax.jit(lambda x: x.sum())
    z = jnp.ones((8, 8))
    float(tiny(z))
    rb = min(_time_once(lambda: float(tiny(z * (1 + i * 1e-3))))
             for i in range(1, 4))
    print(f'readback round-trip  : {rb * 1e3:8.2f} ms (jittered)',
          flush=True)

    def timed_scan(body, x0, flops=None, gbytes=None):
        def chain(x):
            def b(c, _):
                return body(c), ()
            return jax.lax.scan(b, x, None, length=N)[0] \
                .astype(jnp.float32).sum()
        jf = jax.jit(chain)
        float(jf(x0))
        dt = min(_time_once(lambda: float(jf(x0 * (1 + i * 1e-3))))
                 for i in range(1, 4)) / N
        out = f'{dt * 1e3:8.2f} ms'
        if flops:
            out += f'  {flops / dt / 1e12:6.1f} TFLOP/s'
        if gbytes:
            out += f'  {gbytes / dt:6.1f} GB/s'
        return out

    # matmul
    n = 4096
    a = jnp.full((n, n), 1e-3, jnp.bfloat16)
    print('matmul 4096^2 bf16   :',
          timed_scan(lambda c: (c @ a) * 1e-3, a, flops=2 * n ** 3),
          flush=True)

    # conv at U-Net level shapes (bf16, batch 8)
    for (hw, c) in ((512, 64), (256, 128), (128, 256), (64, 512)):
        x = jnp.full((8, hw, hw, c), 0.1, jnp.bfloat16)
        k = jnp.full((3, 3, c, c), 1e-3, jnp.bfloat16)
        conv = lambda v: jax.lax.conv_general_dilated(
            v, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) * 0.5
        fl = 2 * 9 * c * c * hw * hw * 8
        print(f'conv3x3 {hw}^2 x{c:4d}  :', timed_scan(conv, x, flops=fl),
              flush=True)

    # elementwise bandwidth
    x = jnp.full((8, 512, 512, 64), 0.1, jnp.float32)
    gb = x.size * 4 * 2 / 1e9
    print('elementwise f32      :',
          timed_scan(lambda c: c * 1.0001 + 0.5, x, gbytes=gb), flush=True)

    # host->device transfer
    h = np.random.rand(64, 512, 512).astype(np.float32)
    t0 = time.time()
    d = jax.device_put(h)
    jax.block_until_ready(d)
    float(jnp.sum(d[:1, :1, :8]))  # force real sync
    dt = time.time() - t0
    print(f'host->device         : {h.nbytes / dt / 1e6:8.1f} MB/s',
          flush=True)


if __name__ == '__main__':
    main()
