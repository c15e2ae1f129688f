"""Multi-chip (virtual 8-device CPU mesh) sharding tests: data-parallel
train/eval steps must match the single-device result, and the driver
dryrun must execute. Kept tiny — single-core hosts serialize virtual
devices and XLA's collective rendezvous has a 40s window."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.core.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from unet_tpu.models import UNet
from unet_tpu.train import (
    create_loss_function,
    create_optimizer,
    init_train_state,
    make_eval_step,
    make_train_step,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 (virtual) devices')


def _setup(rng, hw=16, batch=8):
    model = UNet(base_features=4)
    tx = create_optimizer(1e-3, weight_decay=0.0, grad_clip=1.0)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((batch, hw, hw, 1)), tx)
    loss_fn = create_loss_function('dice_bce')
    images = rng.standard_normal((1, batch, hw, hw, 1),
                                 dtype=np.float32)
    masks = (rng.random((1, batch, hw, hw)) > 0.8).astype(np.int32)
    return model, tx, state, loss_fn, images, masks


def test_mesh_shapes():
    mesh = create_mesh(jax.devices()[:8])
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ('data', 'model')
    mesh42 = create_mesh(jax.devices()[:8], data_parallel=4,
                         model_parallel=2)
    assert mesh42.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(jax.devices()[:8], data_parallel=3)


def test_sharded_train_step_matches_single_device(rng):
    model, tx, state, loss_fn, images, masks = _setup(rng)
    step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=1))
    lr = jnp.float32(1e-3)
    mb = jnp.ones((1,), jnp.float32)

    # single device
    s1, l1 = step(state, jnp.asarray(images), jnp.asarray(masks), lr, mb)

    # 8-device data parallel
    mesh = create_mesh(jax.devices()[:8])
    state8 = replicate(mesh, state)
    im8, mk8 = shard_batch(mesh, (images, masks), batch_axis=1)
    s8, l8 = step(state8, im8, mk8, lr, mb)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # Adam's first step is ~ lr*sign(grad): cross-device reduction-order
    # noise on near-zero grads can flip signs, so params may differ by
    # up to ~2*lr elementwise. The loss equality above is the strict
    # functional check; this bounds parameter drift.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-3)


def test_sharded_eval_confusion_matrix_is_global(rng):
    model, tx, state, loss_fn, images, masks = _setup(rng)
    eval_step = jax.jit(make_eval_step(model, loss_fn, num_classes=2))
    mesh = create_mesh(jax.devices()[:8])
    state8 = replicate(mesh, state)
    im8, mk8 = shard_batch(mesh, (images[0], masks[0]), batch_axis=0)
    loss1, cm1 = eval_step(state.params, state.batch_stats,
                           jnp.asarray(images[0]), jnp.asarray(masks[0]))
    loss8, cm8 = eval_step(state8.params, state8.batch_stats, im8, mk8)
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm8))
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    assert np.asarray(cm8).sum() == masks[0].size


def test_spatial_sharding_matches_unsharded(rng):
    """H-axis (spatial) partitioning for huge-slice inference
    (core/mesh.py::spatial_sharding): GSPMD must insert the conv halo
    exchanges and reproduce the unsharded prediction. Uses the
    AttentionUNet so the gates' resizes cross the sharded axis too."""
    from unet_tpu.core.mesh import spatial_sharding
    from unet_tpu.models import AttentionUNet
    from unet_tpu.train import make_predict_step

    model = AttentionUNet(base_features=4)
    tx = create_optimizer(1e-3)
    hw = 32  # H shards to 4 rows/device at 8 devices
    state = init_train_state(model, jax.random.key(1),
                             jnp.zeros((1, hw, hw, 1)), tx)
    predict = jax.jit(make_predict_step(model))
    x = rng.standard_normal((1, hw, hw, 1), dtype=np.float32)

    want = np.asarray(predict(state.params, state.batch_stats,
                              jnp.asarray(x)))

    mesh = create_mesh(jax.devices()[:8])
    state8 = replicate(mesh, state)
    xs = jax.device_put(x, spatial_sharding(mesh, h_axis=1))
    got = np.asarray(predict(state8.params, state8.batch_stats, xs))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_driver_dryrun_multichip():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_shard_for_process_partition():
    from unet_tpu.core.distributed import shard_for_process
    items = [f'f{i}' for i in range(10)]
    shards = [shard_for_process(items, index=i, count=3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(items)
    assert all(len(s) in (3, 4) for s in shards)
    # deterministic
    assert shards[0] == shard_for_process(items, index=0, count=3)


def test_init_distributed_single_process_noop():
    from unet_tpu.core.distributed import (init_distributed, process_count,
                                           process_index)
    init_distributed()  # must not raise in single-process mode
    assert process_count() >= 1
    assert 0 <= process_index() < process_count()
