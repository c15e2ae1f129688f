"""Device mesh + sharding policy.

The reference is single-device (unet/utils/general.py:38-57 picks one of
cuda/mps/cpu); the TPU-native replacement is GSPMD data parallelism over a
1-D ``data`` mesh: parameters/optimizer state replicated, batches sharded
on the leading batch axis, gradients and BatchNorm statistics reduced by
XLA-inserted collectives over ICI. A ``model`` axis is exposed for future
tensor-style sharding (unused at this model scale, SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                data_parallel: Optional[int] = None,
                model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f'{data_parallel}x{model_parallel} mesh does not cover '
            f'{n} devices')
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the given axis of a batch across the data axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, h_axis: int = 1) -> NamedSharding:
    """Shard the HEIGHT axis of an NHWC batch across the data axis —
    XLA SPMD spatial partitioning (SURVEY.md §5 "long-context" analogue:
    in this domain scaling 'length' means higher slice resolution).

    Use when one slice is too large for a chip (whole-slide inference,
    big CT volumes at native resolution) or batch < n_devices: GSPMD
    partitions every conv spatially and inserts halo exchanges for the
    3x3 windows automatically; results are bit-compatible with the
    unsharded computation (tests/test_parallel.py proves it on the
    virtual 8-device mesh)."""
    spec = [None] * (h_axis + 1)
    spec[h_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree: Any, batch_axis: int = 0) -> Any:
    """Place a host batch onto the mesh, sharded along ``batch_axis``.

    Single-process: a plain (possibly sharded) transfer. Multi-process:
    every process passes its *local* rows — the slice of the global batch
    owned by its addressable devices — and the global jax.Array is
    assembled with ``make_array_from_process_local_data`` (the global
    batch dim is ``process_count * local``). On a 1-device mesh this is
    a plain transfer (some experimental PJRT backends reject explicit
    shardings)."""
    if jax.process_count() > 1:
        sh = batch_sharding(mesh, batch_axis)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    if mesh.devices.size == 1:
        return jax.tree.map(jax.device_put, tree)
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree onto the mesh fully replicated.

    Multi-process: every process must hold the same values (true for
    seed-deterministic init and for checkpoint restores); the global
    replicated array is assembled from each process's full copy."""
    if jax.process_count() > 1:
        sh = replicated(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    if mesh.devices.size == 1:
        return jax.tree.map(jax.device_put, tree)
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
