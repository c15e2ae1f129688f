"""UNet / Attention U-Net as TPU-native Flax modules (NHWC).

Architecture parity with the reference (unet/models/unet.py): 4-level
encoder (base 64: 64/128/256/512, bottleneck 1024//factor with factor=2
when bilinear), decoder Up/AttentionUp chain, 1x1 OutConv head, optional
deep supervision with 3 auxiliary heads on the 1/2, 1/4 and 1/8 resolution
decoder maps, each bilinearly (align-corners) upsampled to input size
(ref unet.py:170-173, 204-209).

I/O contract: input (N, H, W, n_channels) float, output logits
(N, H, W, n_classes). In training mode with deep_supervision the model
returns a tuple (logits, ds1, ds2, ds3) — same ordering as the reference
list [main, ds1(1/2), ds2(1/4), ds3(1/8)] (ref unet.py:209).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_tpu.models.layers import (
    AttentionUp,
    DoubleConv,
    Down,
    IncPoolS2D,
    OutConv,
    Up,
)
from unet_tpu.ops.resize import resize_bilinear_align_corners


def _use_s2d_level(x: jnp.ndarray) -> bool:
    """Opt-in whole-level s2d encoder level 0 (see layers.IncPoolS2D);
    needs even H and W for the phase split / pool exit."""
    from unet_tpu.core.setup import env_flag
    return (env_flag('UNET_TPU_S2D_LEVEL', False)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)


class _ParamCount:
    """``get_num_params`` API parity (ref unet/models/unet.py:94-106).

    Flax modules hold no bound parameters, so the count takes the
    variables dict (as returned by ``model.init``). Like torch's
    ``.parameters()``, BatchNorm running stats are buffers and never
    counted; every reference parameter has ``requires_grad=True``, so
    ``trainable_only`` does not change the result there or here (the
    flag is kept for signature parity)."""

    def get_num_params(self, variables, trainable_only: bool = True) -> int:
        params = variables.get('params', variables)
        # shape-based count: works on concrete arrays and on the
        # ShapeDtypeStructs produced by jax.eval_shape alike
        return sum(math.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(params))


class UNet(_ParamCount, nn.Module):
    """Vanilla U-Net. Ref unet/models/unet.py:16-106."""

    n_channels: int = 1
    n_classes: int = 2
    bilinear: bool = True
    base_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f, dt = self.base_features, self.dtype
        factor = 2 if self.bilinear else 1
        if _use_s2d_level(x):
            x1, x1p = IncPoolS2D(f, dtype=dt, name='inc')(x, train)
            x2 = Down(f * 2, dtype=dt, name='down1')(x1p, train,
                                                     pre_pooled=True)
        else:
            x1 = DoubleConv(f, dtype=dt, name='inc')(x, train)
            x2 = Down(f * 2, dtype=dt, name='down1')(x1, train)
        x3 = Down(f * 4, dtype=dt, name='down2')(x2, train)
        x4 = Down(f * 8, dtype=dt, name='down3')(x3, train)
        x5 = Down(f * 16 // factor, dtype=dt, name='down4')(x4, train)
        y = Up(f * 8 // factor, self.bilinear, dtype=dt, name='up1')(x5, x4, train)
        y = Up(f * 4 // factor, self.bilinear, dtype=dt, name='up2')(y, x3, train)
        y = Up(f * 2 // factor, self.bilinear, dtype=dt, name='up3')(y, x2, train)
        y = Up(f, self.bilinear, dtype=dt, name='up4')(y, x1, train)
        logits = OutConv(self.n_classes, dtype=dt, name='outc')(y)
        return logits.astype(jnp.float32)


class AttentionUNet(_ParamCount, nn.Module):
    """Attention U-Net with optional deep supervision.
    Ref unet/models/unet.py:109-217.
    """

    n_channels: int = 1
    n_classes: int = 2
    bilinear: bool = True
    base_features: int = 64
    deep_supervision: bool = False
    dtype: Any = jnp.float32
    # True = fused Pallas attention gates on TPU inference (off by
    # default: XLA's whole-graph fusion currently wins end-to-end)
    use_fused_gate: 'Any' = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        f, dt = self.base_features, self.dtype
        factor = 2 if self.bilinear else 1
        in_h, in_w = x.shape[1], x.shape[2]

        if _use_s2d_level(x):
            x1, x1p = IncPoolS2D(f, dtype=dt, name='inc')(x, train)
            x2 = Down(f * 2, dtype=dt, name='down1')(x1p, train,
                                                     pre_pooled=True)
        else:
            x1 = DoubleConv(f, dtype=dt, name='inc')(x, train)
            x2 = Down(f * 2, dtype=dt, name='down1')(x1, train)
        x3 = Down(f * 4, dtype=dt, name='down2')(x2, train)
        x4 = Down(f * 8, dtype=dt, name='down3')(x3, train)
        x5 = Down(f * 16 // factor, dtype=dt, name='down4')(x4, train)

        fg = self.use_fused_gate
        d4 = AttentionUp(f * 8 // factor, self.bilinear, dtype=dt,
                         use_fused_gate=fg, name='up1')(x5, x4, train)
        d3 = AttentionUp(f * 4 // factor, self.bilinear, dtype=dt,
                         use_fused_gate=fg, name='up2')(d4, x3, train)
        d2 = AttentionUp(f * 2 // factor, self.bilinear, dtype=dt,
                         use_fused_gate=fg, name='up3')(d3, x2, train)
        d1 = AttentionUp(f, self.bilinear, dtype=dt,
                         use_fused_gate=fg, name='up4')(d2, x1, train)

        logits = OutConv(self.n_classes, dtype=dt, name='outc')(d1)
        logits = logits.astype(jnp.float32)

        if self.deep_supervision:
            # Heads exist whenever deep_supervision is configured (so the
            # parameter tree is stable across train/eval), but auxiliary
            # outputs are only returned in training mode (ref unet.py:204).
            ds3 = OutConv(self.n_classes, dtype=dt, name='ds_out3')(d4)
            ds2 = OutConv(self.n_classes, dtype=dt, name='ds_out2')(d3)
            ds1 = OutConv(self.n_classes, dtype=dt, name='ds_out1')(d2)
            if train:
                up = lambda t: resize_bilinear_align_corners(
                    t.astype(jnp.float32), in_h, in_w)
                return logits, up(ds1), up(ds2), up(ds3)
        return logits


MODEL_REGISTRY = {
    'unet': UNet,
    'attention_unet': AttentionUNet,
}


def create_model(model_type: str = 'attention_unet', *, n_channels: int = 1,
                 n_classes: int = 2, bilinear: bool = True,
                 base_features: int = 64, deep_supervision: bool = False,
                 dtype: Any = jnp.float32, use_fused_gate: Any = None):
    """Model factory mirroring the reference's train.py:305-310 selection."""
    model_type = model_type.lower()
    if model_type not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model type: {model_type}. "
                         f"Options: {sorted(MODEL_REGISTRY)}")
    kwargs = dict(n_channels=n_channels, n_classes=n_classes,
                  bilinear=bilinear, base_features=base_features, dtype=dtype)
    if model_type == 'attention_unet':
        kwargs['deep_supervision'] = deep_supervision
        kwargs['use_fused_gate'] = use_fused_gate
    return MODEL_REGISTRY[model_type](**kwargs)
