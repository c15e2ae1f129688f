"""unet_tpu — TPU-native (JAX/XLA/Pallas) lung-tumor segmentation framework.

A from-scratch rebuild of the capabilities of seagochen/unet-segment-pytorch
designed TPU-first: NHWC Flax models, bf16 compute / f32 params, on-device
batched augmentation, on-device metrics, gradient accumulation via lax.scan,
GSPMD data parallelism over a jax.sharding.Mesh, Orbax checkpointing, and
Pallas kernels for the hot fused ops.
"""

__version__ = '0.1.0'

from unet_tpu.models import (  # noqa: F401
    AttentionGate,
    AttentionUNet,
    AttentionUp,
    DoubleConv,
    Down,
    OutConv,
    UNet,
    Up,
    create_model,
)
