"""Profiling utilities (trace/StepTimer/nan_guard)."""

import time

import jax
import jax.numpy as jnp
import pytest

from unet_tpu.utils.profiling import StepTimer, annotate, nan_guard, trace


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary(items_per_step=4)
    assert s['steps'] == 3
    assert s['mean_ms'] >= 10
    assert s['items_per_sec'] > 0
    t.reset()
    assert t.summary()['steps'] == 0


def test_step_timer_sync_value():
    t = StepTimer()
    t.start()
    dt = t.stop(sync_value=jnp.float32(1.5))
    assert dt >= 0


def test_trace_noop_and_real(tmp_path):
    with trace(None):
        pass  # no-op
    with trace(tmp_path / 'prof'):
        jax.block_until_ready(jnp.ones(8) * 2)
    assert any((tmp_path / 'prof').rglob('*'))


def test_annotate():
    with annotate('region'):
        jnp.ones(4).sum()


def test_nan_guard_toggles():
    nan_guard(True)
    with pytest.raises(FloatingPointError):
        jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
    nan_guard(False)
    jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
