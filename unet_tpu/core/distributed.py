"""Multi-host (multi-process) support.

The reference is strictly single-process/single-device (SURVEY.md §2.7:
no torch.distributed anywhere). The TPU-native story: one JAX process
per host, ``jax.distributed.initialize`` to form the global runtime,
GSPMD over the global mesh for compute (see core.mesh), and per-process
sharding of the *input* file list so each host decodes only its slice
of the dataset (SURVEY.md §5 input-pipeline plan).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

T = TypeVar('T')


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     shutdown_timeout_seconds: int = 1800) -> None:
    """Initialize the multi-process JAX runtime (no-op when single
    process / already initialized). On Cloud TPU all arguments are
    auto-detected from the metadata server; pass them explicitly on
    other fabrics.

    ``shutdown_timeout_seconds`` defaults far above jax's 300 s: worker
    processes exit right after the last step, while process 0 still
    writes checkpoints/plots — with the default, the workers' shutdown
    barrier expires and the coordination service kills every process
    (observed: exit epilogue > 5 min on a loaded host)."""
    import jax
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            shutdown_timeout_seconds=shutdown_timeout_seconds)
    except (RuntimeError, ValueError):
        if num_processes is not None and num_processes > 1:
            # an explicitly requested multi-process run must not fall
            # back silently to single-process (each process would train
            # independently on the full data and scribble over the
            # other's run dir)
            raise
        # already initialized or single-process environment


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def broadcast_from_main(obj=None):
    """Broadcast a small JSON-serializable object from process 0 to all
    processes (two ``broadcast_one_to_all`` rounds: length, then bytes).

    Used for control-flow decisions every process must agree on — e.g.
    the resume decision: checkpoints live only on process 0's
    filesystem, so workers resolving ``--resume auto`` against their
    own (empty) disks would silently diverge (different start epochs =>
    mismatched collective programs => deadlock)."""
    import json

    import numpy as np
    import jax
    from jax.experimental import multihost_utils as mhu

    payload = (json.dumps(obj).encode() if jax.process_index() == 0
               else b'')
    n = int(np.asarray(mhu.broadcast_one_to_all(
        np.asarray([len(payload)], np.int32)))[0])
    buf = np.zeros((max(n, 1),), np.uint8)
    if jax.process_index() == 0:
        buf[:n] = np.frombuffer(payload, np.uint8)
    data = np.asarray(mhu.broadcast_one_to_all(buf)).tobytes()[:n]
    return json.loads(data.decode())


def broadcast_pytree_from_main(tree):
    """Broadcast a pytree of host arrays from process 0 (other
    processes pass a same-structure tree whose values are ignored).
    Returns fully-replicated global arrays on every process."""
    from jax.experimental import multihost_utils as mhu

    return mhu.broadcast_one_to_all(tree)


def shard_for_process(items: Sequence[T],
                      index: Optional[int] = None,
                      count: Optional[int] = None) -> List[T]:
    """Deterministic strided shard of a (file) list for this process.

    Every process must pass the same ``items`` ordering (e.g. the
    volume-split file list, which is seed-deterministic). Strided
    assignment keeps per-volume slices spread across hosts, balancing
    tumor-containing slices.
    """
    if index is None:
        index = process_index()
    if count is None:
        count = process_count()
    return list(items[index::count])
