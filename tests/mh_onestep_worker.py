"""Worker for tests/test_multihost.py one-step gradient parity.

Runs one forward+backward of the attention U-Net on a FIXED global
batch, either single-process (no args) or as one rank of a 2-process
jax.distributed cluster (args: coordinator, process_id). Prints
``MH_LOSS <f>`` and ``MH_GNORM <f>`` — a multi-process run must
reproduce the single-process values to float noise (the only difference
is the cross-process psum order), which is a sharp sharding-correctness
check that one epoch of Adam (which chaotically amplifies 1e-8 grad
noise on near-zero-gradient weights) is not.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if len(sys.argv) > 1:
        from unet_tpu.core.distributed import init_distributed
        init_distributed(coordinator_address=sys.argv[1],
                         num_processes=2, process_id=int(sys.argv[2]))

    from unet_tpu.core.mesh import create_mesh, replicate, shard_batch
    from unet_tpu.models import create_model
    from unet_tpu.train import create_loss_function, init_train_state
    import optax

    n_dev = len(jax.devices())
    mesh = create_mesh(jax.devices(), data_parallel=n_dev)
    model = create_model('attention_unet', n_channels=1, n_classes=2,
                         bilinear=True, base_features=8,
                         dtype=jnp.float32)
    tx = optax.sgd(1e-3)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((4, 32, 32, 1), jnp.float32), tx)
    state = replicate(mesh, state)
    loss_fn = create_loss_function('dice_bce')

    rng = np.random.default_rng(0)
    imgs = rng.random((4, 32, 32, 1)).astype(np.float32)
    msks = (rng.random((4, 32, 32)) > 0.9).astype(np.int32)
    if jax.process_count() > 1:
        pid = jax.process_index()
        lb = 4 // jax.process_count()
        imgs = imgs[pid * lb:(pid + 1) * lb]
        msks = msks[pid * lb:(pid + 1) * lb]
    gi, gm = shard_batch(mesh, (imgs, msks), batch_axis=0)

    @jax.jit
    def loss_and_gnorm(params, stats, im, mk):
        def loss_of(p):
            outs, _ = model.apply({'params': p, 'batch_stats': stats}, im,
                                  train=True, mutable=['batch_stats'])
            return loss_fn(outs, mk)
        loss, grads = jax.value_and_grad(loss_of)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree.leaves(grads)))
        return loss, gnorm

    loss, gnorm = loss_and_gnorm(state.params, state.batch_stats, gi, gm)
    print(f'MH_LOSS {float(loss):.9f}', flush=True)
    print(f'MH_GNORM {float(gnorm):.9f}', flush=True)


if __name__ == '__main__':
    main()
