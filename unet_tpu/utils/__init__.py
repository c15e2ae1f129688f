from unet_tpu.utils.config import (
    describe_devices,
    get_nested_metric,
    increment_path,
    load_config,
    set_seed,
    validate_config,
)

__all__ = [
    'load_config', 'increment_path', 'set_seed', 'describe_devices',
    'validate_config', 'get_nested_metric',
]
