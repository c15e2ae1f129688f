from unet_tpu.models.layers import (
    AttentionGate,
    AttentionUp,
    DoubleConv,
    Down,
    OutConv,
    Up,
)
from unet_tpu.models.unet import MODEL_REGISTRY, AttentionUNet, UNet, create_model

__all__ = [
    'DoubleConv', 'Down', 'Up', 'OutConv', 'AttentionGate', 'AttentionUp',
    'UNet', 'AttentionUNet', 'create_model', 'MODEL_REGISTRY',
]
