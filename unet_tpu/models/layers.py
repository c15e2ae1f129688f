"""U-Net building blocks as TPU-native Flax modules (NHWC, bf16-friendly).

Re-implements the behavior of the reference blocks
(reference: unet/models/layers.py) with a TPU-first design:

* NHWC layout (TPU-native conv layout; the reference is NCHW torch).
* Compute dtype is configurable (bf16 on TPU for MXU throughput);
  parameters and BatchNorm statistics stay float32.
* Bilinear upsampling uses align-corners gather+lerp tables
  (`unet_tpu.ops.resize`) matching torch ``align_corners=True``.
* BatchNorm statistics are computed over the *global* batch: under
  ``jit`` + GSPMD sharding the batch-axis mean/var reductions are global
  reductions, so XLA inserts the cross-replica collectives automatically —
  no torch-style per-device stats drift.

Blocks (names and wiring match the reference for checkpoint/parity):
  DoubleConv  (Conv3x3 no-bias -> BN -> ReLU) x2   ref layers.py:16-41
  Down        MaxPool2 -> DoubleConv                ref layers.py:44-61
  Up          upsample/pad/concat[skip, up]/DoubleConv  ref layers.py:64-106
  OutConv     1x1 conv with bias                    ref layers.py:109-123
  AttentionGate  additive attention (Oktay et al.)  ref layers.py:126-192
  AttentionUp    gate skip, then Up                 ref layers.py:195-255
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from unet_tpu.ops.resize import (
    pad_to_match,
    resize_bilinear_align_corners,
    upsample2x_align_corners,
)

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (new-stat fraction).
# flax momentum is the old-stat fraction -> 0.9.
_BN_MOMENTUM = 0.9
_BN_EPS = 1e-5


def _bn(train: bool, name: str):
    """Float32 BatchNorm regardless of compute dtype (stats stability)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=_BN_MOMENTUM,
        epsilon=_BN_EPS,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        name=name,
    )


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) x 2. Ref layers.py:16-41."""

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_channels if self.mid_channels is not None else self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name='conv1')(x)
        x = _bn(train, 'bn1')(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name='conv2')(x)
        x = _bn(train, 'bn2')(x)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool(2) -> DoubleConv. Ref layers.py:44-61."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, dtype=self.dtype,
                          name='conv')(x, train)


class OutConv(nn.Module):
    """1x1 conv (with bias) to class logits. Ref layers.py:109-123."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name='conv')(x)


class Up(nn.Module):
    """Upsample decoder, pad to skip size, concat [skip, up], DoubleConv.

    Ref layers.py:64-106. Bilinear variant uses mid = concat_channels // 2
    (ref layers.py:79); transposed variant halves channels with a 2x2/s2
    ConvTranspose (ref layers.py:81).
    """

    out_channels: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        if self.bilinear:
            x1 = upsample2x_align_corners(x1)
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
        else:
            x1 = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2), strides=(2, 2),
                                  use_bias=True, dtype=self.dtype,
                                  param_dtype=jnp.float32, name='up')(x1)
            mid = None
        x1 = pad_to_match(x1, x2.shape[1], x2.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)  # [skip, up], ref layers.py:105
        return DoubleConv(self.out_channels, mid_channels=mid,
                          dtype=self.dtype, name='conv')(x, train)


class AttentionGate(nn.Module):
    """Additive attention gate (Oktay et al.). Ref layers.py:126-192.

    attention = sigmoid(BN(psi(relu(BN(W_g g_up) + BN(W_x x)))))
    where g is first bilinearly upsampled (align-corners) to x's size
    (ref layers.py:183). All 1x1 convs are bias-free. Returns x * attention.
    inter_channels defaults to skip_channels // 2 (ref layers.py:147-148).
    """

    inter_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        inter = (self.inter_channels if self.inter_channels is not None
                 else x.shape[-1] // 2)
        g_up = resize_bilinear_align_corners(g, x.shape[1], x.shape[2])
        g1 = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name='w_g')(g_up)
        g1 = _bn(train, 'bn_g')(g1)
        x1 = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name='w_x')(x)
        x1 = _bn(train, 'bn_x')(x1)
        a = nn.relu(g1 + x1)
        a = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name='psi')(a)
        a = _bn(train, 'bn_psi')(a)
        a = nn.sigmoid(a)
        return x * a.astype(x.dtype)


class AttentionUp(nn.Module):
    """AttentionGate on the skip (gated by the un-upsampled decoder map,
    ref layers.py:240-241), then Up-style upsample/pad/concat/DoubleConv.
    Ref layers.py:195-255.
    """

    out_channels: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x2_att = AttentionGate(dtype=self.dtype, name='attention')(
            x1, x2, train)
        if self.bilinear:
            x1 = upsample2x_align_corners(x1)
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
        else:
            x1 = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2), strides=(2, 2),
                                  use_bias=True, dtype=self.dtype,
                                  param_dtype=jnp.float32, name='up')(x1)
            mid = None
        x1 = pad_to_match(x1, x2_att.shape[1], x2_att.shape[2])
        x = jnp.concatenate([x2_att, x1], axis=-1)
        return DoubleConv(self.out_channels, mid_channels=mid,
                          dtype=self.dtype, name='conv')(x, train)
