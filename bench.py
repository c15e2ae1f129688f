#!/usr/bin/env python
"""Throughput benchmark: 512x512 train slices/sec/chip on the flagship
AttentionUNet config (the reference's headline workload,
configs/lung_tumor.yaml: attention_unet, base 64, bilinear, dice_bce).

Measurement methodology: N full optimizer steps are chained INSIDE one
jitted ``lax.scan`` over N distinct pre-generated batches, and the wall
clock covers the whole scan (after a separate warmup call). This (a)
amortizes dispatch/tunnel overhead the way a real input-pipelined
training loop does, and (b) defeats any result caching of repeated
identical executions. Each scanned step is the complete train step:
forward + backward + clip + AdamW + BatchNorm stat updates.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6),
so we use an analytic estimate of its setup — fp32 eager torch on the
README's implied "limited VRAM" GPU (RTX-3060-class, ~13 TFLOP/s fp32
peak, ~35% effective on this conv mix => ~4.5 TFLOP/s sustained; model
~155 GFLOP/slice forward, ~3x for fwd+bwd => ~465 GFLOP/slice) =>
~9.7 slices/s. vs_baseline = measured / 9.7; the BASELINE.md north-star
is vs_baseline >= 5.

Secondary MEASURED anchor (BASELINE.md "Measured anchors"): the
reference's own train step (AttentionUNet b64, DiceBCE, AdamW, batch 1)
on this host's CPU runs 15.18 s/step at 512px single-thread =
0.066 slices/s; the GPU estimate above is ~147x that, consistent with
an RTX-3060-class part vs one Skylake core on conv-heavy fp32 work.
Sensitivity: a +/-2x error in the GPU estimate moves vs_baseline
between ~0.5x and ~2x of the reported value — hence the absolute
numbers (ms/step, TFLOP/s) also reported on stderr, which stand on
their own.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Details (inference throughput, step time, model TFLOP/s) go to stderr.
"""

import json
import sys
import time

EST_REF_TRAIN_SLICES_PER_SEC = 9.7    # analytic GPU estimate (docstring)
MEASURED_REF_CPU_SLICES_PER_SEC = 0.066  # measured on this host, 512px
TRAIN_GFLOP_PER_SLICE = 465.0         # ~155 fwd x3 for fwd+bwd, fp math

IMG = 512
STEPS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()

    from unet_tpu.models import AttentionUNet
    from unet_tpu.train import (create_loss_function, create_optimizer,
                                init_train_state, make_predict_step,
                                make_train_step)

    log(f'backend: {jax.default_backend()}, devices: {jax.devices()}')

    model = AttentionUNet(n_channels=1, n_classes=2, bilinear=True,
                          base_features=64, dtype=jnp.bfloat16)
    tx = create_optimizer(5e-5, weight_decay=1e-4, grad_clip=1.0)
    state0 = init_train_state(model, jax.random.key(0),
                              jnp.zeros((1, 64, 64, 1), jnp.float32), tx)
    loss_fn = create_loss_function('dice_bce')
    rng = np.random.default_rng(0)

    # NOTE on timing: on the tunneled TPU backend, block_until_ready does
    # not reliably await execution; forcing a scalar host readback
    # (float()) is the only trustworthy sync. Inputs are pre-transferred
    # device buffers (host->device over the tunnel runs at ~26 MB/s and
    # must not pollute the compute measurement), and every timed call
    # gets distinct data to defeat execution-result caching.
    def bench_train(batch):
        step_fn = make_train_step(model, loss_fn, tx, accum_steps=1)
        ones = jnp.ones((1,), jnp.float32)
        lr = jnp.float32(5e-5)

        def chain(state, data):
            def body(st, xs):
                im, mk = xs
                st, loss = step_fn(st, im, mk, lr, ones)
                return st, loss
            _, losses = jax.lax.scan(body, state, data)
            return losses.sum()

        run = jax.jit(chain)
        datas = []
        for _ in range(3):
            im = jax.device_put(rng.random((STEPS, 1, batch, IMG, IMG, 1),
                                           dtype=np.float32))
            mk = jax.device_put((rng.random((STEPS, 1, batch, IMG, IMG))
                                 > 0.99).astype(np.int32))
            datas.append((im, mk))
        t0 = time.time()
        warm = float(run(state0, datas[0]))
        log(f'train[b{batch}] x{STEPS} first call (compile+run): '
            f'{time.time() - t0:.1f}s, loss sum {warm:.3f}')
        times = []
        for d in datas:
            t0 = time.time()
            v = float(run(state0, d))
            times.append(time.time() - t0)
            assert np.isfinite(v), v
        dt = min(times)
        sps = batch * STEPS / dt
        log(f'train[b{batch}]: {sps:.2f} slices/s '
            f'({dt / STEPS * 1e3:.1f} ms/step, '
            f'{sps * TRAIN_GFLOP_PER_SLICE / 1e3:.1f} TFLOP/s)')
        return sps, dt / STEPS * 1e3

    def bench_infer(batch):
        pred_fn = make_predict_step(model)

        def chain(params, stats, data):
            def body(acc, im):
                p = pred_fn(params, stats, im)
                return acc + jnp.sum(p[..., 1]), ()
            return jax.lax.scan(body, jnp.float32(0.0), data)[0]

        run = jax.jit(chain)
        datas = [jax.device_put(rng.random((STEPS, batch, IMG, IMG, 1),
                                           dtype=np.float32))
                 for _ in range(3)]
        float(run(state0.params, state0.batch_stats, datas[0]))  # warm
        times = []
        for d in datas:
            t0 = time.time()
            float(run(state0.params, state0.batch_stats, d))
            times.append(time.time() - t0)
        dt = min(times)
        sps = batch * STEPS / dt
        log(f'infer[b{batch}]: {sps:.2f} slices/s')
        return sps

    train_sps, ms_step, infer_sps = 0.0, 0.0, 0.0
    for batch in (8, 4, 2):
        try:
            train_sps, ms_step = bench_train(batch)
            break
        except Exception as e:
            log(f'train batch {batch} failed ({type(e).__name__}: '
                f'{str(e)[:120]}); trying smaller')
    try:
        infer_sps = bench_infer(8)
    except Exception as e:
        log(f'infer bench failed: {type(e).__name__}: {str(e)[:120]}')

    # full detail record on stderr (absolute numbers that stand on their
    # own regardless of baseline-estimate error; schema-stable for
    # round-over-round comparison)
    log(json.dumps({
        'train_slices_per_sec': round(train_sps, 2),
        'ms_per_step': round(ms_step, 1),
        'train_tflops': round(train_sps * TRAIN_GFLOP_PER_SLICE / 1e3, 1),
        'infer_slices_per_sec': round(infer_sps, 2),
        'vs_gpu_estimate': round(
            train_sps / EST_REF_TRAIN_SLICES_PER_SEC, 2),
        'vs_measured_cpu_anchor': round(
            train_sps / MEASURED_REF_CPU_SLICES_PER_SEC, 1),
    }))
    print(json.dumps({
        'metric': 'train_slices_per_sec_per_chip_512px',
        'value': round(train_sps, 2),
        'unit': 'slices/s',
        'vs_baseline': round(train_sps / EST_REF_TRAIN_SLICES_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
