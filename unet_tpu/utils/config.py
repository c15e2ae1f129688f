"""Config loading, run-dir management, seeding, device report.

Same YAML schema and key semantics as the reference
(configs/lung_tumor.yaml; loader at unet/utils/general.py:60-77; run-dir
increment at general.py:80-107). The device story differs by design: JAX
owns device selection (TPU > CPU fallback), and reproducibility is
key-threaded `jax.random` plus seeded host RNGs for file shuffling.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, Union

import numpy as np
import yaml


def load_config(config_path: Union[str, Path]) -> Dict:
    """Load a YAML config (ref general.py:60-77)."""
    config_path = Path(config_path)
    if not config_path.exists():
        raise FileNotFoundError(f'Config file not found: {config_path}')
    with open(config_path) as f:
        return yaml.safe_load(f)


def increment_path(path: Union[str, Path], sep: str = '') -> Path:
    """runs/exp -> runs/exp2 -> runs/exp3 ... (ref general.py:80-107)."""
    path = Path(path)
    if not path.exists():
        return path
    for n in range(2, 1000):
        candidate = Path(f'{path}{sep}{n}')
        if not candidate.exists():
            return candidate
    raise RuntimeError(f'Could not find a free run dir for {path}')


def set_seed(seed: int = 42) -> None:
    """Seed host-side RNGs (python, numpy). Device-side randomness is
    key-threaded via jax.random (the functional analogue of
    ref general.py:20-35; there is no cudnn knob — XLA compilation is
    deterministic for fixed shapes)."""
    random.seed(seed)
    np.random.seed(seed)


def describe_devices() -> str:
    """Human-readable device summary (the reference prints its single
    cuda/mps/cpu pick, general.py:38-57; we report the JAX mesh view)."""
    import jax
    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    parts = [f'{n}x {k}' for k, n in kinds.items()]
    return f"{jax.default_backend()} ({', '.join(parts)})"


_VALID_SCHEDULERS = ('cosine_annealing', 'warmup_cosine',
                     'reduce_on_plateau')
_VALID_LOSSES = ('dice', 'ce', 'crossentropy', 'balanced_ce', 'dice_bce')
_VALID_MODELS = ('unet', 'attention_unet', 'attention')


def validate_config(cfg: Dict) -> Dict:
    """Light schema validation on top of the reference's freeform dict
    (reference does none; errors there surface deep in training)."""
    model = cfg.get('model', {})
    mtype = model.get('type', 'unet').lower()
    if mtype not in _VALID_MODELS:
        raise ValueError(f"model.type '{mtype}' not in {_VALID_MODELS}")
    loss = cfg.get('loss', {})
    ltype = loss.get('type', 'dice_bce').lower()
    if ltype not in _VALID_LOSSES:
        raise ValueError(f"loss.type '{ltype}' not in {_VALID_LOSSES}")
    sched = cfg.get('scheduler', {})
    stype = sched.get('type', 'reduce_on_plateau')
    if stype not in _VALID_SCHEDULERS:
        raise ValueError(
            f"scheduler.type '{stype}' not in {_VALID_SCHEDULERS}")
    img_size = cfg.get('data', {}).get('img_size', 512)
    if img_size < 16:
        # 4 pooling levels floor-halve the map; below 16 the bottleneck
        # collapses. Non-multiples of 16 are fine: the decoder pads the
        # upsampled map to the skip (ref layers.py:98-102), same here
        # (models/layers.py pad_to_match) — exercised end-to-end in
        # tests/test_odd_sizes.py.
        raise ValueError(
            f'data.img_size must be >= 16 (4 pooling levels), '
            f'got {img_size}')
    return cfg


def get_nested_metric(results: Dict, key: str) -> float:
    """Nested metric lookup like 'class_dice.tumor'
    (ref callbacks.py:136-156 / train.py:505-513)."""
    if '.' in key:
        val = results
        for part in key.split('.'):
            val = val.get(part, {}) if isinstance(val, dict) else 0.0
        return float(val) if not isinstance(val, dict) else 0.0
    v = results.get(key, 0.0)
    return float(v) if not isinstance(v, dict) else 0.0
