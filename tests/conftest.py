"""Test config: run all tests on CPU with 8 virtual XLA devices so that
multi-chip mesh/sharding paths can be exercised without real TPU hardware
(SURVEY.md §4 test strategy)."""

import os

# Force the CPU backend even when a TPU plugin (e.g. 'axon') is present.
# The plugin's sitecustomize imports jax at interpreter boot, so env vars
# alone are too late — set the config explicitly too. Env vars are still
# exported for any subprocesses tests spawn.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
