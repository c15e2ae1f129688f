from unet_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)
from unet_tpu.core.distributed import (
    init_distributed,
    process_count,
    process_index,
    shard_for_process,
)
from unet_tpu.core.setup import (
    donate_argnums,
    enable_compilation_cache,
    enable_nan_debugging,
    supports_donation,
)

__all__ = [
    'create_mesh', 'batch_sharding', 'replicated', 'shard_batch',
    'replicate', 'DATA_AXIS', 'MODEL_AXIS',
    'enable_compilation_cache', 'enable_nan_debugging',
    'supports_donation', 'donate_argnums',
    'init_distributed', 'process_count', 'process_index',
    'shard_for_process',
]
