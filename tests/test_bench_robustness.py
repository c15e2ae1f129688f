"""bench.py robustness contract (repo invariant, VERDICT r3 item 2):
EXACTLY one JSON metric line on stdout no matter what — the r3 driver
artifact (BENCH_r03.json rc=1, bare traceback) must never recur.

These tests exercise the failure paths only; they are fast because the
parent process never imports jax (probing happens on a bare socket).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ)
    # force the no-TPU path: point the probe at a port nothing listens on
    env.update(env_extra)
    # the parent must not inherit a forced-cpu env (that would skip the
    # probe); keep the test hermetic either way
    proc = subprocess.run(
        [sys.executable, str(REPO / 'bench.py')],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=timeout, env=env, cwd=REPO)
    return proc


def test_dead_relay_emits_exactly_one_json_error_line():
    env = {'UNET_TPU_RELAY_PORT': '1',        # reserved port, never open
           'UNET_TPU_BENCH_PROBE_S': '3',
           'JAX_PLATFORM_NAME': '', 'JAX_PLATFORMS': ''}
    proc = _run_bench(env)
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.decode().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec['metric'] == 'train_slices_per_sec_per_chip_512px'
    assert rec['value'] == 0
    assert rec['error'] == 'tpu-unavailable'
    assert set(rec) >= {'metric', 'value', 'unit', 'vs_baseline'}


def test_worker_crash_still_emits_one_json_line():
    """Forced-cpu env skips the probe; a tiny child timeout kills the
    worker mid-import — the parent must still print the error record."""
    env = {'JAX_PLATFORM_NAME': 'cpu', 'JAX_PLATFORMS': 'cpu',
           'UNET_TPU_BENCH_TIMEOUT_S': '2'}
    proc = _run_bench(env)
    assert proc.returncode == 0
    lines = [ln for ln in proc.stdout.decode().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec['value'] == 0
    assert 'error' in rec
