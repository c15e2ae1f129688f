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

Robustness contract (the repo invariant): this script prints EXACTLY
one JSON line on stdout, no matter what. The top-level process never
imports jax; it (1) probes the TPU relay socket with bounded
retry/backoff (the axon plugin hangs on a dead relay — see
.claude/skills/verify/SKILL.md), (2) runs the measurement in a child
process under a hard timeout, and (3) on any failure — dead relay,
child crash, wedge/timeout — still emits the JSON line with value 0
and an "error" field, exiting 0 so the driver records a parseable
artifact instead of a traceback.

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
Details (aug-on end-to-end throughput, inference throughput, step
time, model TFLOP/s) go to stderr.
"""

import json
import os
import socket
import subprocess
import sys
import time

EST_REF_TRAIN_SLICES_PER_SEC = 9.7    # analytic GPU estimate (docstring)
MEASURED_REF_CPU_SLICES_PER_SEC = 0.066  # measured on this host, 512px
TRAIN_GFLOP_PER_SLICE = 465.0         # ~155 fwd x3 for fwd+bwd, fp math

IMG = 512
STEPS = 8
METRIC = 'train_slices_per_sec_per_chip_512px'

RELAY_PORT = int(os.environ.get('UNET_TPU_RELAY_PORT', '8082'))
# Bounded windows (seconds), env-overridable for interactive use.
PROBE_WINDOW = float(os.environ.get('UNET_TPU_BENCH_PROBE_S', '600'))
CHILD_TIMEOUT = float(os.environ.get('UNET_TPU_BENCH_TIMEOUT_S', '2400'))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(value, vs_baseline, error=None, aug_on=None):
    """The one stdout JSON line. Never raises. ``aug_on`` carries the
    end-to-end augmentation-on figure IN the record so the headline
    number can never silently exclude the input pipeline."""
    rec = {'metric': METRIC, 'value': value, 'unit': 'slices/s',
           'vs_baseline': vs_baseline}
    if aug_on is not None:
        rec['aug_on_value'] = aug_on
    if error:
        rec['error'] = error
    print(json.dumps(rec), flush=True)


def forced_cpu() -> bool:
    return (os.environ.get('JAX_PLATFORM_NAME', '').startswith('cpu')
            or os.environ.get('JAX_PLATFORMS', '').startswith('cpu'))


def relay_alive() -> bool:
    s = socket.socket()
    s.settimeout(3.0)
    try:
        s.connect(('127.0.0.1', RELAY_PORT))
        return True
    except OSError:
        return False
    finally:
        s.close()


def wait_for_relay(window_s: float) -> bool:
    """Probe the relay socket with exponential backoff for up to
    ``window_s``. A cheap connect is the ONLY safe probe: spinning up a
    jax client against a dead relay hangs in C code and, if
    timeout-killed with work in flight, can wedge the remote worker for
    the next run (verify skill triage notes)."""
    deadline = time.time() + window_s
    delay = 2.0
    while True:
        if relay_alive():
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        log(f'bench: TPU relay 127.0.0.1:{RELAY_PORT} down; retrying in '
            f'{delay:.0f}s ({remaining:.0f}s left in probe window)')
        time.sleep(min(delay, remaining))
        delay = min(delay * 2, 60.0)


# --------------------------------------------------------------------
# Worker: the actual measurement (child process; may crash/hang freely)
# --------------------------------------------------------------------

def worker():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.setup import enable_compilation_cache
    enable_compilation_cache()

    from unet_tpu.data.augmentations import AugmentConfig, augment_batch
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

    def bench_train_aug(batch, accum=4):
        """Aug-on end-to-end device figure: the exact per-super-batch
        device program the train CLI runs (cli/train.py ``step``) —
        uint8->f32 scale, batched augmentation of the whole super-batch,
        then the accum-microbatch train step — chained over STEPS
        distinct super-batches. This is the number a user sees training
        the flagship config (input pipeline included; the host side is
        overlapped by prefetch and measured separately in DESIGN.md)."""
        step_fn = make_train_step(model, loss_fn, tx, accum_steps=accum)
        ones = jnp.ones((accum,), jnp.float32)
        lr = jnp.float32(5e-5)
        aug_cfg = AugmentConfig()
        sb = accum * batch

        def chain(state, key, data):
            def body(carry, xs):
                st, k = carry
                im, mk = xs
                k, kk = jax.random.split(k)
                flat_i = im.astype(jnp.float32).reshape(
                    sb, IMG, IMG, 1) / 255.0
                flat_m = mk.reshape(sb, IMG, IMG)
                flat_i, flat_m = augment_batch(flat_i, flat_m, kk, aug_cfg)
                st, loss = step_fn(
                    st, flat_i.reshape(accum, batch, IMG, IMG, 1),
                    flat_m.reshape(accum, batch, IMG, IMG), lr, ones)
                return (st, k), loss
            (_, _), losses = jax.lax.scan(body, (state, key), data)
            return losses.sum()

        run = jax.jit(chain)
        datas = []
        for _ in range(3):
            im = jax.device_put(
                (rng.random((STEPS, accum, batch, IMG, IMG, 1)) * 255)
                .astype(np.uint8))
            mk = jax.device_put((rng.random((STEPS, accum, batch, IMG, IMG))
                                 > 0.99).astype(np.int32))
            datas.append((im, mk))
        key = jax.random.key(7)
        t0 = time.time()
        warm = float(run(state0, key, datas[0]))
        log(f'train-aug[b{batch}x{accum}] x{STEPS} first call '
            f'(compile+run): {time.time() - t0:.1f}s, loss sum {warm:.3f}')
        times = []
        for d in datas:
            t0 = time.time()
            v = float(run(state0, key, d))
            times.append(time.time() - t0)
            assert np.isfinite(v), v
        dt = min(times)
        sps = sb * STEPS / dt
        log(f'train-aug[b{batch}x{accum}]: {sps:.2f} slices/s '
            f'({dt / STEPS * 1e3:.1f} ms/super-batch)')
        return sps

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

    train_sps, ms_step, infer_sps, aug_sps = 0.0, 0.0, 0.0, 0.0
    infer_best_batch = 0
    for batch in (8, 4, 2):
        try:
            train_sps, ms_step = bench_train(batch)
            break
        except Exception as e:
            log(f'train batch {batch} failed ({type(e).__name__}: '
                f'{str(e)[:120]}); trying smaller')
    try:
        aug_sps = bench_train_aug(8)
    except Exception as e:
        log(f'train-aug bench failed: {type(e).__name__}: {str(e)[:120]}')
    # inference batch sweep: eval memory is cheap, so larger batches may
    # amortize per-step overhead past the b8 figure the CLI defaults to
    for batch in (8, 16, 32):
        try:
            sps = bench_infer(batch)
        except Exception as e:
            log(f'infer batch {batch} failed: {type(e).__name__}: '
                f'{str(e)[:120]}')
            break
        if sps > infer_sps:
            infer_sps, infer_best_batch = sps, batch

    # full detail record on stderr (absolute numbers that stand on their
    # own regardless of baseline-estimate error; schema-stable for
    # round-over-round comparison)
    log(json.dumps({
        'train_slices_per_sec': round(train_sps, 2),
        'train_aug_slices_per_sec': round(aug_sps, 2),
        'ms_per_step': round(ms_step, 1),
        'train_tflops': round(train_sps * TRAIN_GFLOP_PER_SLICE / 1e3, 1),
        'infer_slices_per_sec': round(infer_sps, 2),
        'infer_best_batch': infer_best_batch,
        'vs_gpu_estimate': round(
            train_sps / EST_REF_TRAIN_SLICES_PER_SEC, 2),
        'vs_measured_cpu_anchor': round(
            train_sps / MEASURED_REF_CPU_SLICES_PER_SEC, 1),
    }))
    emit(round(train_sps, 2),
         round(train_sps / EST_REF_TRAIN_SLICES_PER_SEC, 2),
         aug_on=round(aug_sps, 2))

    # AFTER the metric line is already on stdout (the parent relays the
    # last parseable line, so nothing below can lose it): attempt the
    # r4 ablations so a driver-only TPU window still captures them.
    # 1) whole-level s2d train step (pure XLA; env read at trace time,
    #    and bench_train re-traces its chain on every call)
    if (os.environ.get('UNET_TPU_S2D_LEVEL') != '1'
            and jax.default_backend() == 'tpu' and train_sps > 0):
        try:
            os.environ['UNET_TPU_S2D_LEVEL'] = '1'
            s2d_sps, s2d_ms = bench_train(8)
            log(json.dumps({'train_s2d_level_slices_per_sec':
                            round(s2d_sps, 2),
                            'ms_per_step_s2d_level': round(s2d_ms, 1)}))
        except Exception as e:
            log(f's2d-level ablation failed: {type(e).__name__}: '
                f'{str(e)[:160]}')
        finally:
            del os.environ['UNET_TPU_S2D_LEVEL']
    # 1b) larger device batches for the train step — b32/accum1 has
    #    IDENTICAL effective-batch semantics to the CLI's b8x4 accum
    #    (BN stats aggregate once per optimizer step either way), so a
    #    win here is a pure YAML flip (batch_size: 32,
    #    accumulation_steps: 1). Only on the flag-free base run to keep
    #    r4_measure.sh's ablation matrix from re-paying the compiles.
    if (os.environ.get('UNET_TPU_S2D_LEVEL') != '1'
            and os.environ.get('UNET_TPU_PALLAS_WARP') != '1'
            and jax.default_backend() == 'tpu' and train_sps > 0):
        for batch in (16, 32):
            # one retry per size: the r4 b32 run died with a relay-side
            # remote-compile HTTP 500 that was never triaged — a retry
            # distinguishes relay flake (second attempt compiles fine)
            # from a real XLA/HBM ceiling (fails identically twice,
            # worth documenting as the memory envelope)
            ok = False
            for attempt in (1, 2):
                try:
                    b_sps, b_ms = bench_train(batch)
                    log(json.dumps(
                        {f'train_b{batch}_slices_per_sec': round(b_sps, 2),
                         f'ms_per_step_b{batch}': round(b_ms, 1)}))
                    ok = True
                    break
                except Exception as e:  # OOM at 512^2 is plausible
                    log(f'train b{batch} ablation failed '
                        f'(attempt {attempt}/2): '
                        f'{type(e).__name__}: {str(e)[:160]}')
                    if attempt == 1:
                        time.sleep(20)  # let the relay settle
            if not ok:
                break
    # 2) XLA-gather aug ablation. The Pallas banded warp is the TPU
    #    default since r4 (the aug_sps above measures it); re-measuring
    #    with the kernel off keeps the win visible round-over-round.
    #    Runs dead last: kernel-path problems can wedge the remote
    #    worker. Skipped when the user pinned the flag either way.
    if (os.environ.get('UNET_TPU_PALLAS_WARP') is None
            and jax.default_backend() == 'tpu'):
        try:
            os.environ['UNET_TPU_PALLAS_WARP'] = '0'
            if hasattr(augment_batch, 'clear_cache'):
                augment_batch.clear_cache()  # re-trace under the flag
                aug_xla = bench_train_aug(8)
                log(json.dumps({'train_aug_xla_gather_slices_per_sec':
                                round(aug_xla, 2)}))
            else:
                log('aug ablation skipped: augment_batch has no '
                    'clear_cache on this jax')
        except Exception as e:
            log(f'xla-gather aug ablation failed: {type(e).__name__}: '
                f'{str(e)[:160]}')
        finally:
            del os.environ['UNET_TPU_PALLAS_WARP']


# --------------------------------------------------------------------
# Parent: probe + supervise
# --------------------------------------------------------------------

def main():
    if not forced_cpu() and not wait_for_relay(PROBE_WINDOW):
        log('bench: TPU relay unreachable after probe window; emitting '
            'error record (the relay is externally owned and cannot be '
            'restarted from this host)')
        emit(0, 0, error='tpu-unavailable')
        return
    cmd = [sys.executable, os.path.abspath(__file__), '--worker']

    def relay_metric_line(stdout_bytes) -> bool:
        """Print the LAST stdout line that parses as the metric record."""
        text = (stdout_bytes or b'').decode(errors='replace')
        for line in reversed(text.splitlines()):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if isinstance(rec, dict) and rec.get('metric') == METRIC:
                print(line, flush=True)
                return True
        return False

    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              timeout=CHILD_TIMEOUT)
    except subprocess.TimeoutExpired as e:
        # the metric line may already be out (the post-metric ablation
        # attempts are allowed to be slow/hung) — salvage it
        if not relay_metric_line(e.stdout):
            emit(0, 0, error=f'bench-timeout-{int(CHILD_TIMEOUT)}s')
        return
    except Exception as e:  # spawn failure
        emit(0, 0, error=f'bench-spawn-{type(e).__name__}')
        return
    if not relay_metric_line(proc.stdout):
        emit(0, 0, error=f'bench-crashed-rc{proc.returncode}')


if __name__ == '__main__':
    if '--worker' in sys.argv:
        try:
            worker()
        except Exception as e:
            log(f'bench worker failed: {type(e).__name__}: {e}')
            emit(0, 0, error=f'worker-{type(e).__name__}')
            sys.exit(1)
    else:
        main()
