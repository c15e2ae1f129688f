#!/usr/bin/env python
"""Decoder conv1: virtual-concat pair form vs materialized concat.

DoubleConv's pair form (models/layers.py) computes
conv1(concat([skip, up])) as two channel-sliced convs summed, to avoid
materializing the concat in HBM. The r3 s2d investigation measured that
XLA runs square 64->64 convs at ~32 TFLOP/s but mixed-channel 128->64
convs at ~95 — so at the C=64 level the pair form may be trading one
cheap HBM pass for two slow convs. This bench measures both forms at
every decoder level shape, fwd and fwd+grads.

Usage: python benchmarks/concat_bench.py [--full]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache

    enable_compilation_cache()
    full = '--full' in sys.argv
    print(f'backend: {jax.default_backend()} (full={full})', flush=True)
    N = 8 if full else 32
    dn = ('NHWC', 'HWIO', 'NHWC')

    def timed(fn, x0):
        def chain(xy):
            def b(c, _):
                return fn(c), ()
            return jax.tree.map(
                lambda v: v.astype(jnp.float32).sum(),
                jax.lax.scan(b, xy, None, length=N)[0])
        def loss(xy):
            out = chain(xy)
            return sum(jax.tree.leaves(out))
        if full:
            jf = jax.jit(lambda xy: sum(
                g.astype(jnp.float32).sum()
                for g in jax.tree.leaves(jax.grad(loss)(xy))))
        else:
            jf = jax.jit(loss)
        float(jf(x0))

        def once(v):
            t0 = time.time()
            float(jf(v))
            return time.time() - t0
        return min(once(jax.tree.map(lambda t: t * (1 + i * 1e-3), x0))
                   for i in range(1, 4)) / N

    # decoder levels at base 64 (hw, c_skip, c_up, c_out=mid)
    levels = [(512, 64, 64, 64), (256, 128, 128, 128),
              (128, 256, 256, 256), (64, 512, 512, 512)]
    for hw, cs, cu, co in levels:
        a = jnp.full((8, hw, hw, cs), 0.1, jnp.bfloat16)
        b = jnp.full((8, hw, hw, cu), 0.1, jnp.bfloat16)
        k = jnp.full((3, 3, cs + cu, co), 1e-2, jnp.bfloat16)
        kr = jnp.full((3, 3, co, cs), 1e-2, jnp.bfloat16)  # close cycle

        def conv(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1), 'SAME', dimension_numbers=dn)

        def pair(ab):
            x, y = ab
            z = conv(x, k[:, :, :cs]) + conv(y, k[:, :, cs:])
            # keep the carry's structure: route z back to both inputs
            return conv(z, kr), conv(z, kr) * 0.5 + y * 0.5

        def cat(ab):
            x, y = ab
            z = conv(jnp.concatenate([x, y], axis=-1), k)
            return conv(z, kr), conv(z, kr) * 0.5 + y * 0.5

        dt_p = timed(pair, (a, b))
        dt_c = timed(cat, (a, b))
        tag = 'fwd+grads' if full else 'fwd'
        print(f'{hw}^2 [{cs}+{cu}]->{co} {tag}: '
              f'pair {dt_p * 1e3:6.2f}  concat {dt_c * 1e3:6.2f} ms',
              flush=True)


if __name__ == '__main__':
    main()
