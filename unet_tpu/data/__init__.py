from unet_tpu.data.augmentations import (
    AugmentConfig,
    augment_batch,
    augment_batch_seeded,
    normalize_batch,
)
from unet_tpu.data.dataset import (
    BatchLoader,
    create_dataloaders,
    SliceDataset,
    SyntheticSliceDataset,
    prefetch_to_device,
    volume_split,
)

__all__ = [
    'create_dataloaders', 'SliceDataset', 'SyntheticSliceDataset', 'BatchLoader', 'volume_split',
    'prefetch_to_device', 'AugmentConfig', 'augment_batch', 'augment_batch_seeded',
    'normalize_batch',
]
