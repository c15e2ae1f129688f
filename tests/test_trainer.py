"""Trainer tests: overfit a tiny synthetic problem, grad-accum leftover
semantics, EMA state machine, and scheduler parity with torch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.models import UNet
from unet_tpu.train.losses import create_loss_function
from unet_tpu.train.metrics import SegmentationMetrics
from unet_tpu.train.schedules import (
    ReduceLROnPlateau,
    cosine_annealing,
    create_scheduler,
    warmup_cosine,
)
from unet_tpu.train.trainer import (
    create_optimizer,
    ema_reinit,
    ema_update,
    init_train_state,
    make_eval_step,
    make_train_step,
    group_into_superbatches,
)


def _toy_batch(rng, n=8, hw=16):
    """Synthetic 'tumor' squares on noisy background."""
    images = rng.standard_normal((n, hw, hw, 1), dtype=np.float32) * 0.1
    masks = np.zeros((n, hw, hw), np.int32)
    for i in range(n):
        r, c = rng.integers(2, hw - 6, 2)
        masks[i, r:r + 4, c:c + 4] = 1
        images[i, r:r + 4, c:c + 4, 0] += 2.0
    return images, masks


def test_overfit_tiny(rng):
    model = UNet(base_features=4)
    images, masks = _toy_batch(rng)
    tx = create_optimizer(lr=1e-2, weight_decay=0.0, grad_clip=1.0)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 16, 16, 1)), tx)
    loss_fn = create_loss_function('dice_bce')
    step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=2))
    sb_images = jnp.asarray(images).reshape(2, 4, 16, 16, 1)
    sb_masks = jnp.asarray(masks).reshape(2, 4, 16, 16)
    mask = jnp.ones((2,), jnp.float32)

    losses = []
    for _ in range(100):
        state, loss_sum = step(state, sb_images, sb_masks,
                               jnp.float32(1e-2), mask)
        losses.append(float(loss_sum) / 2)
    assert losses[-1] < losses[0] * 0.45, losses[::10]

    eval_step = jax.jit(make_eval_step(model, loss_fn, num_classes=2))
    _, cm = eval_step(state.params, state.batch_stats,
                      jnp.asarray(images), jnp.asarray(masks))
    m = SegmentationMetrics(2, ['background', 'tumor'])
    m.update_from_matrix(cm)
    assert m.compute()['class_dice']['tumor'] > 0.5


def test_overfit_fixed_augmented_batch(rng):
    """Learning WITH the full augmentation program in the loop: a batch
    pushed through augment_batch (every stage active at reference
    probabilities) must be fittable exactly like raw data — if any stage
    corrupted the image/label relationship (misaligned warp, double
    normalization, mask dtype damage), the loss would floor instead of
    descending. Guards the aug+train integration that per-stage golden
    tests can't see (found wanting in an r4 investigation: CLI-level
    collapse at 128² traced to config, not code, via exactly this
    probe)."""
    from unet_tpu.data.augmentations import AugmentConfig, augment_batch

    model = UNet(base_features=4)
    images, masks = _toy_batch(rng, n=8, hw=32)
    ai, am = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                           jax.random.key(3), AugmentConfig())
    assert int((np.asarray(am) > 0).sum()) > 0, 'aug wiped every tumor'
    tx = create_optimizer(lr=1e-2, weight_decay=0.0, grad_clip=1.0)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 32, 32, 1)), tx)
    loss_fn = create_loss_function('dice_bce')
    step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=2))
    sb_images = ai.reshape(2, 4, 32, 32, 1)
    sb_masks = am.reshape(2, 4, 32, 32)
    mask = jnp.ones((2,), jnp.float32)

    losses = []
    for _ in range(60):
        state, loss_sum = step(state, sb_images, sb_masks,
                               jnp.float32(1e-2), mask)
        losses.append(float(loss_sum) / 2)
    # corrupted labels floor the loss near its initial value (the r4
    # CLI-collapse signature was a flat ~0.98x after hundreds of steps);
    # healthy descent measured at 0.67x after 60 steps on this batch
    assert losses[-1] < losses[0] * 0.75, losses[::10]


def test_leftover_mask_skips_padded_microbatches(rng):
    """A padded (mask=0) microbatch must not change grads or BN stats."""
    model = UNet(base_features=4)
    images, masks = _toy_batch(rng, n=4)
    tx = create_optimizer(lr=1e-3)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 16, 16, 1)), tx)
    loss_fn = create_loss_function('dice_bce')
    step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=2))

    imgs = jnp.asarray(images).reshape(2, 2, 16, 16, 1)
    msks = jnp.asarray(masks).reshape(2, 2, 16, 16)
    # Run with the second microbatch masked out, and with it replaced by
    # garbage + masked out: results must be identical.
    garbage = imgs.at[1].set(1e6)
    lr = jnp.float32(1e-3)
    m = jnp.asarray([1.0, 0.0], jnp.float32)
    s1, l1 = step(state, imgs, msks, lr, m)
    s2, l2 = step(state, garbage, msks, lr, m)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_blend_and_reinit():
    params = {'w': jnp.ones((2,))}
    stats = {'s': jnp.zeros((2,))}
    from unet_tpu.train.trainer import EmaState, TrainState
    ema = EmaState(params={'w': jnp.zeros((2,))}, batch_stats={'s': jnp.ones((2,))},
                   updates=jnp.zeros((), jnp.int32))
    ema2 = ema_update(ema, params, stats, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema2.params['w']), 0.1, rtol=1e-6)
    # buffers copied directly (ref general.py:180-184)
    np.testing.assert_allclose(np.asarray(ema2.batch_stats['s']), 0.0)
    assert int(ema2.updates) == 1

    st = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    batch_stats=stats, opt_state=(), ema=ema2)
    st = ema_reinit(st)
    np.testing.assert_allclose(np.asarray(st.ema.params['w']), 1.0)
    assert int(st.ema.updates) == 0


def test_ema_warmup_ramp():
    from unet_tpu.train.trainer import EmaState
    ema = EmaState(params={'w': jnp.zeros(())}, batch_stats={},
                   updates=jnp.zeros((), jnp.int32))
    # With warmup, first update uses decay min(0.999, 2/11)
    ema2 = ema_update(ema, {'w': jnp.ones(())}, {}, decay=0.999,
                      warmup_steps=100)
    expect = (1 - min(0.999, 2 / 11))
    np.testing.assert_allclose(float(ema2.params['w']), expect, rtol=1e-6)


def test_group_into_superbatches():
    assert list(group_into_superbatches(10, 4)) == [(0, 4), (4, 4), (8, 2)]
    assert list(group_into_superbatches(8, 4)) == [(0, 4), (4, 4)]


def test_cosine_annealing_matches_torch():
    torch = pytest.importorskip('torch')
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=5e-5)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=150,
                                                       eta_min=1e-6)
    ours = cosine_annealing(5e-5, 150, 1e-6)
    for epoch in range(150):
        np.testing.assert_allclose(ours(epoch), opt.param_groups[0]['lr'],
                                   rtol=1e-6)
        sched.step()


def test_warmup_cosine_shape():
    lr = warmup_cosine(5e-5, warmup_epochs=10, total_epochs=150,
                       warmup_lr=1e-6)
    np.testing.assert_allclose(lr(0), 1e-6, rtol=1e-6)
    np.testing.assert_allclose(lr(10), 5e-5, rtol=1e-6)
    assert lr(149) < 1e-7  # decays toward 0, not min_lr
    assert lr(5) < lr(9) < lr(10) > lr(50) > lr(100)


def test_plateau_reduces_after_patience():
    s = ReduceLROnPlateau(1e-3, mode='max', factor=0.5, patience=2,
                          min_lr=1e-6)
    assert not s.step(0.5)
    for i, expect in enumerate([False, False, True]):
        assert s.step(0.4) is expect
    np.testing.assert_allclose(s.lr, 5e-4)
    assert s.num_reductions == 1


def test_create_scheduler_factory():
    kind, sched = create_scheduler({'type': 'warmup_cosine',
                                    'warmup_epochs': 10}, 5e-5, 150)
    assert kind == 'epoch' and callable(sched)
    kind, sched = create_scheduler({'type': 'reduce_on_plateau'}, 5e-5, 150)
    assert kind == 'plateau' and isinstance(sched, ReduceLROnPlateau)


def test_lr_injection_changes_updates(rng):
    """Same grads, different lr scalars -> different param deltas."""
    model = UNet(base_features=4)
    images, masks = _toy_batch(rng, n=2)
    tx = create_optimizer(lr=1e-3, weight_decay=0.0)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 16, 16, 1)), tx)
    loss_fn = create_loss_function('dice')
    step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=1))
    imgs = jnp.asarray(images).reshape(1, 2, 16, 16, 1)
    msks = jnp.asarray(masks).reshape(1, 2, 16, 16)
    m = jnp.ones((1,), jnp.float32)
    s_small, _ = step(state, imgs, msks, jnp.float32(1e-5), m)
    s_big, _ = step(state, imgs, msks, jnp.float32(1e-2), m)
    d_small = jnp.linalg.norm(s_small.params['inc']['conv1']['kernel']
                              - state.params['inc']['conv1']['kernel'])
    d_big = jnp.linalg.norm(s_big.params['inc']['conv1']['kernel']
                            - state.params['inc']['conv1']['kernel'])
    assert float(d_big) > float(d_small) * 10


def test_predict_step_u8_matches_host_normalize(rng):
    """The uint8-wire predict step (normalize-on-device) matches
    host-normalized f32 inputs to float precision: u8->f32 is exact and
    the device runs the same (x/255 - 0.5)/0.5 ops (ref
    predict.py:100-135) — except XLA compiles /255.0 as a
    reciprocal-multiply, so normalized inputs differ by <=1 ULP
    (measured 1.19e-7 max); the probabilities must stay within a few
    ULP and the thresholded masks identical."""
    from unet_tpu.train.trainer import make_predict_step, make_predict_step_u8

    model = UNet(base_features=4)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 16, 16, 1)),
                             create_optimizer(lr=1e-3, weight_decay=0.0))
    u8 = rng.integers(0, 256, (3, 16, 16, 1)).astype(np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    p_f32 = np.asarray(jax.jit(make_predict_step(model))(
        state.params, state.batch_stats, f32))
    p_u8 = np.asarray(jax.jit(make_predict_step_u8(model))(
        state.params, state.batch_stats, u8))
    np.testing.assert_allclose(p_f32, p_u8, atol=1e-5, rtol=0)
    np.testing.assert_array_equal(p_f32[..., 1] > 0.5, p_u8[..., 1] > 0.5)
