#!/usr/bin/env python
"""Where does the in-graph s2d loss come from?

benchmarks/s2d_bench.py shows the isolated 64->64 conv wins in s2d
layout, but bench.py shows the full model LOSES when individual convs
are routed (116->139 ms/step). This bench isolates the mechanism on a
DoubleConv-like block (conv-BN-ReLU-conv-BN-ReLU, 64->64->64):

  plain      : logical layout throughout
  op-s2d     : each conv routed via s2d (reshape in/out per conv) —
               what the model integration does
  level-s2d  : ONE s2d at block entry, convs + BN + ReLU all computed
               in s2d space (BN stats averaged over the two phase
               blocks - same math), ONE d2s at exit

FINDING (recorded in docs/DESIGN.md): op-s2d and level-s2d time the
SAME here (5.73 vs 5.77 ms vs plain 8.03) because adjacent d2s/s2d
reshapes cancel across scan iterations — the chain runs entirely in s2d
layout and never pays a boundary relayout. This is a methodology trap:
chained microbenches CANNOT see layout-boundary costs, which is exactly
what makes the full model LOSE (116->139 ms/step) when individual convs
are routed. Any layout-change experiment must be ablated end-to-end.

Usage: python benchmarks/s2d_level_bench.py [--train]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    from unet_tpu.ops.s2d import (conv3x3_s2d_w, d2s_w, s2d_kernel_w,
                                  s2d_w)

    enable_compilation_cache()
    train = '--train' in sys.argv
    print(f'backend: {jax.default_backend()} (train={train})', flush=True)
    # grad-of-scan keeps every iteration's residuals live: 8 chained
    # blocks already exceed HBM at 512^2 unless shortened
    N = 8 if train else 32
    C = 64
    HW = 512

    def timed(fn, x0, args):
        def chain(x):
            def b(c, _):
                return fn(c, *args), ()
            return jax.lax.scan(b, x, None, length=N)[0] \
                .astype(jnp.float32).sum()
        jf = jax.jit((lambda v: jax.grad(chain)(v)
                      .astype(jnp.float32).sum())
                     if train else chain)
        float(jf(x0))

        def once(v):
            t0 = time.time()
            float(jf(v))
            return time.time() - t0
        return min(once(x0 * (1 + i * 1e-3)) for i in range(1, 4)) / N

    def bn_relu(y, scale, bias):
        # eval-mode BN shape: per-channel affine + relu (running stats
        # folded); in s2d space parameters are tiled 2x
        return jnp.maximum(y * scale + bias, 0.0)

    rngk = jax.random.key(0)
    k1 = jax.random.normal(rngk, (3, 3, C, C), jnp.float32) * 0.05
    k2 = jax.random.normal(rngk, (3, 3, C, C), jnp.float32) * 0.05
    sc = jnp.full((C,), 0.9, jnp.bfloat16)
    bi = jnp.full((C,), 0.01, jnp.bfloat16)
    sc2 = jnp.concatenate([sc, sc])
    bi2 = jnp.concatenate([bi, bi])
    dn = ('NHWC', 'HWIO', 'NHWC')

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), 'SAME', dimension_numbers=dn)

    def plain(x, k1, k2):
        y = bn_relu(conv(x, k1), sc, bi)
        return bn_relu(conv(y, k2), sc, bi)

    def op_s2d(x, k1, k2):
        y = bn_relu(conv3x3_s2d_w(x, k1.astype(x.dtype)), sc, bi)
        return bn_relu(conv3x3_s2d_w(y, k2.astype(x.dtype)), sc, bi)

    def level_s2d(x, k1, k2):
        xs = s2d_w(x)
        K1 = s2d_kernel_w(k1.astype(x.dtype))
        K2 = s2d_kernel_w(k2.astype(x.dtype))
        ys = bn_relu(jax.lax.conv_general_dilated(
            xs, K1, (1, 1), 'SAME', dimension_numbers=dn), sc2, bi2)
        ys = bn_relu(jax.lax.conv_general_dilated(
            ys, K2, (1, 1), 'SAME', dimension_numbers=dn), sc2, bi2)
        return d2s_w(ys)

    x = jnp.full((8, HW, HW, C), 0.1, jnp.bfloat16)
    for name, fn in (('plain', plain), ('op-s2d', op_s2d),
                     ('level-s2d', level_s2d)):
        dt = timed(fn, x, (k1, k2))
        print(f'{name:10s}: {dt * 1e3:6.2f} ms', flush=True)


if __name__ == '__main__':
    main()
