"""Runtime setup helpers: persistent compilation cache, NaN debugging.

The reference's only perf knob is ``cudnn.benchmark=True``
(unet/utils/general.py:35). On TPU the equivalent leverage points are
(a) the persistent XLA compilation cache — first compiles of the 512x512
U-Net train step are expensive (and remote-compiled on tunneled
devices), so cache them across processes — and (b) ``jax_debug_nans``
as the race-detector/sanitizer analogue (SURVEY.md §5).
"""

from __future__ import annotations

import os
from pathlib import Path


def env_flag(name: str, default: bool) -> bool:
    """Consistent boolean env-var parsing for the TPU-path toggles
    (UNET_TPU_MM_RESIZE / UNET_TPU_PSI_EINSUM /
    UNET_TPU_ELEMENTWISE_POOL): unset -> ``default``; '0'/'false'/''
    (case-insensitive) -> False; anything else -> True."""
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ('0', 'false', '')


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        'UNET_TPU_COMPILE_CACHE',
        str(Path.home() / '.cache' / 'unet_tpu_xla'))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass  # older jax without these flags


def supports_donation() -> bool:
    """Whether the active backend supports input-output buffer aliasing
    (donation). The experimental 'axon' tunneled-TPU plugin rejects or
    hangs on donated buffers; plain CPU/TPU/GPU backends are fine.
    Donation halves peak HBM for the train step, so it is enabled
    whenever supported."""
    if os.environ.get('UNET_TPU_FORCE_DONATE') == '1':
        return True
    return 'axon' not in os.environ.get('JAX_PLATFORMS', '')


def donate_argnums(*argnums: int):
    """The argnums to donate when the backend supports it, else ()."""
    return tuple(argnums) if supports_donation() else ()


def enable_nan_debugging() -> None:
    """jax_debug_nans: fail fast with a traceback on the first NaN —
    the JAX-native analogue of a sanitizer pass."""
    import jax
    jax.config.update('jax_debug_nans', True)
