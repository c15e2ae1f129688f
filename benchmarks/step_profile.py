#!/usr/bin/env python
"""Ablation profile of the train step: where do the milliseconds go?

Times stripped-down variants of the b8/512px train step (same chained-
scan + scalar-readback methodology as bench.py) so the gap between any
two variants isolates one component: backward pass, optimizer, loss,
attention gates. Run on an idle host.

Usage: python benchmarks/step_profile.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMG = 512
BATCH = 8
STEPS = 8


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    from unet_tpu.models import AttentionUNet, UNet
    from unet_tpu.train import (create_loss_function, create_optimizer,
                                init_train_state, make_train_step)

    print(f'backend: {jax.default_backend()} {jax.devices()}', flush=True)
    rng = np.random.default_rng(0)
    tx = create_optimizer(5e-5, weight_decay=1e-4, grad_clip=1.0)
    loss_fn = create_loss_function('dice_bce')

    def data():
        im = jax.device_put(rng.random((STEPS, 1, BATCH, IMG, IMG, 1),
                                       dtype=np.float32))
        mk = jax.device_put((rng.random((STEPS, 1, BATCH, IMG, IMG))
                             > 0.99).astype(np.int32))
        return im, mk

    datas = [data() for _ in range(3)]

    def timed(run, *args):
        float(run(*args, datas[0]))  # warm
        times = []
        for d in datas:
            t0 = time.time()
            float(run(*args, d))
            times.append(time.time() - t0)
        return min(times) / STEPS * 1e3

    def report(name, ms):
        print(f'{name:34s}: {ms:7.1f} ms/step '
              f'({BATCH / ms * 1e3:6.1f} slices/s)', flush=True)

    def full_step(model):
        state0 = init_train_state(model, jax.random.key(0),
                                  jnp.zeros((1, 64, 64, 1), jnp.float32), tx)
        step_fn = make_train_step(model, loss_fn, tx, accum_steps=1)
        ones = jnp.ones((1,), jnp.float32)

        def chain(state, d):
            im, mk = d

            def body(st, xs):
                st, loss = step_fn(st, xs[0], xs[1], jnp.float32(5e-5), ones)
                return st, loss
            return jax.lax.scan(body, state, (im, mk))[1].sum()
        return jax.jit(chain), state0

    def grad_only(model, lf):
        state0 = init_train_state(model, jax.random.key(0),
                                  jnp.zeros((1, 64, 64, 1), jnp.float32), tx)

        def chain(params, stats, d):
            im, mk = d

            def body(c, xs):
                def loss_of(p):
                    outs, mut = model.apply(
                        {'params': p, 'batch_stats': stats}, xs[0][0],
                        train=True, mutable=['batch_stats'])
                    return lf(outs, xs[1][0])
                loss, grads = jax.value_and_grad(loss_of)(params)
                leaves = [jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in jax.tree.leaves(grads)]
                return c + loss + sum(leaves) * 0.0, ()
            return jax.lax.scan(body, jnp.float32(0.0), (im, mk))[0]
        return jax.jit(chain), state0

    def fwd_only(model, lf, train):
        state0 = init_train_state(model, jax.random.key(0),
                                  jnp.zeros((1, 64, 64, 1), jnp.float32), tx)

        def chain(params, stats, d):
            im, mk = d

            def body(c, xs):
                if train:
                    outs, _ = model.apply(
                        {'params': params, 'batch_stats': stats}, xs[0][0],
                        train=True, mutable=['batch_stats'])
                else:
                    outs = model.apply(
                        {'params': params, 'batch_stats': stats}, xs[0][0],
                        train=False)
                return c + lf(outs, xs[1][0]), ()
            return jax.lax.scan(body, jnp.float32(0.0), (im, mk))[0]
        return jax.jit(chain), state0

    att = AttentionUNet(n_channels=1, n_classes=2, bilinear=True,
                        base_features=64, dtype=jnp.bfloat16)
    plain = UNet(n_channels=1, n_classes=2, bilinear=True,
                 base_features=64, dtype=jnp.bfloat16)
    triv = lambda outs, mk: jnp.sum(  # noqa: E731
        (outs[0] if isinstance(outs, (tuple, list)) else outs)
        .astype(jnp.float32)) * 1e-6

    run, st = full_step(att)
    report('attention full step', timed(run, st))
    run, st = grad_only(att, loss_fn)
    report('attention fwd+bwd (no opt)', timed(run, st.params,
                                               st.batch_stats))
    run, st = grad_only(att, triv)
    report('attention fwd+bwd trivial loss', timed(run, st.params,
                                                   st.batch_stats))
    run, st = fwd_only(att, loss_fn, True)
    report('attention fwd train-mode', timed(run, st.params,
                                             st.batch_stats))
    run, st = fwd_only(att, loss_fn, False)
    report('attention fwd eval-mode', timed(run, st.params,
                                            st.batch_stats))
    run, st = full_step(plain)
    report('plain unet full step', timed(run, st))
    run, st = grad_only(plain, loss_fn)
    report('plain unet fwd+bwd (no opt)', timed(run, st.params,
                                                st.batch_stats))


if __name__ == '__main__':
    main()
