"""Jitted training/eval steps: grad accumulation, EMA, on-device metrics.

TPU-native re-design of the reference hot loop (scripts/train.py:103-197):

* One jitted ``train_step`` consumes a *super-batch* of
  ``accumulation_steps`` microbatches shaped (A, B, H, W, C) and performs
  the whole accumulate->clip->AdamW->EMA sequence on device via
  ``lax.scan`` — the reference's per-microbatch Python loop
  (train.py:127-150) collapses into one XLA program, so HBM traffic and
  launch overhead vanish.
* Loss math runs in float32 on bf16 forward activations; parameters and
  optimizer state stay float32.
* A per-microbatch mask replicates the reference's leftover-flush
  semantics (train.py:153-159: when the epoch length isn't divisible by
  accumulation_steps, the tail still steps the optimizer with fewer
  accumulated grads, each already divided by accumulation_steps).
* BatchNorm running stats update on every real microbatch, like the
  reference's per-forward update.
* EMA follows unet/utils/general.py:110-198: constant decay (the
  reference's ramp only applies when warmup_steps > 0, which train.py
  never sets), params blended, BN buffers copied directly.
* ``eval_step`` returns (loss_sum, confusion_matrix) so the host only
  touches a (C, C) int matrix per epoch — the reference's per-pixel
  Python metrics loop (metrics.py:82-84) is gone.

Under GSPMD the same steps scale to a multi-chip ``data`` mesh unchanged:
batches are sharded on the microbatch axis, XLA inserts gradient/BN-stat
all-reduces over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_tpu.train.metrics import confusion_matrix_update

Array = jax.Array


class EmaState(struct.PyTreeNode):
    """Functional EMA shadow (ref unet/utils/general.py:110-198)."""
    params: Any
    batch_stats: Any
    updates: Array  # int32 scalar


class TrainState(struct.PyTreeNode):
    step: Array  # int32 scalar (optimizer steps taken)
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[EmaState] = None


def create_optimizer(lr: float, weight_decay: float = 1e-4,
                     grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (ref train.py:139-141, 346-350).
    The learning rate is injected so the host can set it per epoch, which
    reproduces the reference's per-epoch scheduler stepping."""
    def make(learning_rate):
        steps = []
        if grad_clip and grad_clip > 0:
            steps.append(optax.clip_by_global_norm(grad_clip))
        steps.append(optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                                 weight_decay=weight_decay))
        return optax.chain(*steps)
    return optax.inject_hyperparams(make)(learning_rate=lr)


def init_train_state(model, rng: Array, sample_input: Array,
                     tx: optax.GradientTransformation,
                     use_ema: bool = False) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    # EMA buffers must be distinct copies: aliasing params would make
    # the same buffer appear twice in a donated train-step argument.
    ema = EmaState(params=jax.tree.map(jnp.copy, params),
                   batch_stats=jax.tree.map(jnp.copy, batch_stats),
                   updates=jnp.zeros((), jnp.int32)) if use_ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      ema=ema)


def ema_update(ema: EmaState, params: Any, batch_stats: Any,
               decay: float, warmup_steps: int = 0) -> EmaState:
    """One EMA update (ref general.py:156-184): optional early ramp
    min(decay, (1+u)/(10+u)), params blended, buffers copied."""
    updates = ema.updates + 1
    if warmup_steps > 0:
        d = jnp.where(updates <= warmup_steps,
                      jnp.minimum(decay, (1.0 + updates) / (10.0 + updates)),
                      decay).astype(jnp.float32)
    else:
        d = jnp.float32(decay)
    new_params = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                              ema.params, params)
    return EmaState(params=new_params, batch_stats=batch_stats,
                    updates=updates)


def ema_reinit(state: TrainState) -> TrainState:
    """Re-initialize EMA from the live model at the warmup transition
    epoch (ref train.py:464-467) and reset its update counter. Copies,
    not aliases: donated steps need distinct buffers."""
    return state.replace(
        ema=EmaState(params=jax.tree.map(jnp.copy, state.params),
                     batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
                     updates=jnp.zeros((), jnp.int32)))


def make_train_step(model, loss_fn: Callable, tx: optax.GradientTransformation,
                    accum_steps: int, ema_decay: float = 0.99,
                    use_ema: bool = False) -> Callable:
    """Build the jitted super-batch train step.

    Returned fn signature:
      train_step(state, images, masks, lr, mb_mask) -> (state, loss_sum)
    where images (A, B, H, W, C) float32, masks (A, B, H, W) int32,
    lr scalar float32, mb_mask (A,) float32 in {0, 1} marking real
    microbatches. loss_sum is the sum of per-microbatch losses (the host
    divides by the number of real microbatches per epoch, matching ref
    train.py:161).
    """

    def micro(params, batch_stats, img, msk):
        def loss_of(p):
            outs, mut = model.apply(
                {'params': p, 'batch_stats': batch_stats}, img, train=True,
                mutable=['batch_stats'])
            return loss_fn(outs, msk), mut['batch_stats']
        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        return loss, grads, new_stats

    def train_step(state: TrainState, images: Array, masks: Array,
                   lr: Array, mb_mask: Array):
        def body(carry, xs):
            gsum, stats, lsum = carry
            img, msk, m = xs
            loss, grads, new_stats = micro(state.params, stats, img, msk)
            gsum = jax.tree.map(lambda a, g: a + m * g, gsum, grads)
            stats = jax.tree.map(lambda o, n: jnp.where(m > 0, n, o),
                                 stats, new_stats)
            return (gsum, stats, lsum + m * loss), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (gsum, batch_stats, loss_sum), _ = jax.lax.scan(
            body, (zeros, state.batch_stats, jnp.float32(0.0)),
            (images, masks, mb_mask))
        grads = jax.tree.map(lambda g: g / accum_steps, gsum)

        opt_state = state.opt_state
        opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema = state.ema
        if use_ema and ema is not None:
            ema = ema_update(ema, params, batch_stats, ema_decay)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats, opt_state=opt_state,
                             ema=ema), loss_sum

    return train_step


def make_eval_step(model, loss_fn: Callable, num_classes: int,
                   with_weights: bool = False) -> Callable:
    """eval_step(params, batch_stats, images, masks)
    -> (loss, confusion_matrix). Ref scripts/train.py:164-197.

    ``with_weights=True`` adds a per-sample weight vector argument
    (multi-host tail batches are padded to a static shape by repeating
    the last sample; pad rows get weight 0). Weights gate BOTH the
    confusion matrix (pad rows contribute nothing, so Dice/IoU/accuracy
    match the unpadded computation bit-for-bit) and the scalar loss
    (``sample_weights`` in unet_tpu.train.losses), so a monitor of
    'loss' sees the same value a single-process run computes on its
    smaller tail batch. Requires ``loss_fn`` to accept a
    ``sample_weights`` keyword (create_loss_function products do).
    """

    def eval_step(params, batch_stats, images: Array, masks: Array):
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             images, train=False)
        loss = loss_fn(logits, masks)
        cm = confusion_matrix_update(logits, masks, num_classes)
        return loss, cm

    def eval_step_weighted(params, batch_stats, images: Array, masks: Array,
                           weights: Array):
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             images, train=False)
        loss = loss_fn(logits, masks, sample_weights=weights)
        # weight-0 rows -> target -1, which confusion_matrix_update drops
        gated = jnp.where(weights[:, None, None] > 0,
                          masks.astype(jnp.int32), -1)
        cm = confusion_matrix_update(logits, gated, num_classes)
        return loss, cm

    return eval_step_weighted if with_weights else eval_step


def make_predict_step(model) -> Callable:
    """predict_step(params, batch_stats, images) -> softmax probs NHWC."""

    def predict_step(params, batch_stats, images: Array):
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             images, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return predict_step


def make_predict_step_u8(model) -> Callable:
    """``make_predict_step`` variant taking (N, H, W, 1) uint8 and
    normalizing on device ((x/255 - 0.5)/0.5, ref predict.py:100-135).
    The serving/predict wire ships raw bytes — 4x less host->HBM
    traffic than pre-normalized f32, which matters both on real hosts
    (PCIe) and acutely on the tunneled dev backend (~26 MB/s link,
    docs/DESIGN.md); the train path made the same uint8-wire move in
    r3."""
    base = make_predict_step(model)

    def predict_step(params, batch_stats, u8: Array):
        x = u8.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        return base(params, batch_stats, x)

    return predict_step


def make_predict_masks_step(model) -> Callable:
    """Full device-side inference for the predict/serve readback wire:
    uint8 slices in, BIT-PACKED thresholded tumor masks out.

    ``step(params, batch_stats, u8, thresholds)`` takes (N, H, W, 1)
    uint8 raw inputs and a (T,) f32 threshold vector, and returns
    (T, N, H, ceil(W/8)) uint8 — for each threshold t the packed mask
    of ``softmax(logits)[..., 1] > t`` (ref predict.py:138-165
    semantics; same f32 ``>`` the host applied before). Thresholding on
    device shrinks the device->host readback from 4 B/px of f32
    probability to 1 bit/px: at 512² that is 1 MB -> 32 KB per slice —
    decisive on the ~26 MB/s tunneled link and real PCIe relief in
    production serving. Unpack with ops.bitpack.unpack_masks_host.
    """
    from unet_tpu.ops.bitpack import pack_masks_device

    base = make_predict_step_u8(model)

    def step(params, batch_stats, u8: Array, thresholds: Array):
        tumor = base(params, batch_stats, u8)[..., 1]     # (N, H, W) f32
        masks = tumor[None] > thresholds[:, None, None, None]
        return pack_masks_device(masks)

    return step


def make_serve_masks_step(model) -> Callable:
    """Per-row-threshold variant of ``make_predict_masks_step`` for the
    serving tier: ``step(params, batch_stats, u8, thresholds)`` with a
    (N,) threshold vector (each micro-batched request carries its own
    ``?threshold=``) returns (N, H, ceil(W/8)) packed masks."""
    from unet_tpu.ops.bitpack import pack_masks_device

    base = make_predict_step_u8(model)

    def step(params, batch_stats, u8: Array, thresholds: Array):
        tumor = base(params, batch_stats, u8)[..., 1]     # (N, H, W) f32
        return pack_masks_device(tumor > thresholds[:, None, None])

    return step


def group_into_superbatches(n_batches: int, accum_steps: int):
    """Yield (start, count) index groups covering n_batches in chunks of
    accum_steps; the final group may be shorter (leftover flush,
    ref train.py:153-159)."""
    for start in range(0, n_batches, accum_steps):
        yield start, min(accum_steps, n_batches - start)
