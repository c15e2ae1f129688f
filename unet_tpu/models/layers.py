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

from unet_tpu.ops.pool import max_pool
from unet_tpu.ops.resize import (
    pad_to_match,
    resize_bilinear_align_corners,
    upsample2x_align_corners,
)

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (new-stat fraction).
# flax momentum is the old-stat fraction -> 0.9.
_BN_MOMENTUM = 0.9
_BN_EPS = 1e-5

# torch nn.Conv2d's default weight init is kaiming_uniform(a=sqrt(5)) =
# U(+-1/sqrt(fan_in)) — variance scale 1/3 of lecun. Matching it matters
# for *training-dynamics* parity, not just converged capability: the
# r3 cross-framework control (docs/parity_r3/) measured the torch
# reference reaching 0.79 val tumor dice by epoch 2 while the same
# model under flax's default lecun_normal (1.73x larger std) took 12
# epochs — and re-running from ported torch-init weights reproduced the
# torch trajectory. Biases (OutConv / ConvTranspose) follow torch's
# U(+-1/sqrt(fan_in)) as well, via per-site closures that know fan_in.
_TORCH_CONV_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')
# flax ConvTranspose kernels are (kh, kw, in, out); torch's fan_in for
# ConvTranspose2d is out*kh*kw = flax 'fan_out'
_TORCH_CONVT_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_out', 'uniform')


def _torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch.nn.BatchNorm2d's exact semantics.

    Differs from flax ``nn.BatchNorm`` in one detail needed for stored-
    running-stat parity with the reference: torch normalizes with the
    BIASED batch variance but updates the running variance with the
    UNBIASED one (factor n/(n-1), torch _BatchNorm.forward); flax uses
    the biased variance for both. Mean/var reductions run in float32
    (same as flax's force_float32_reductions), scale/bias/running stats
    are float32, and only the normalization elementwise math runs in the
    compute dtype — halving HBM traffic on the 512x512 feature maps.
    """

    use_running_average: bool
    momentum: float = _BN_MOMENTUM  # old-stat fraction (torch: 0.1 new)
    epsilon: float = _BN_EPS
    dtype: Any = jnp.float32
    # >1: the input is a phase-packed layout (e.g. width-s2d, ops/s2d.py)
    # whose channel axis is ``phases`` copies of the LOGICAL channels
    # ([q=0 block | q=1 block | ...]). Stats are aggregated across the
    # phase blocks so they equal the logical-layout stats exactly (each
    # logical pixel appears in exactly one block), and the parameter /
    # running-stat shapes stay per-LOGICAL-channel — the tree is
    # identical to the phases=1 layout.
    phases: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        feats = x.shape[-1] // self.phases
        scale = self.param('scale', nn.initializers.ones_init(),
                           (feats,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (feats,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((feats,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            # accumulate in >= f32 (f32 for the bf16/f32 compute paths,
            # f64 under jax_enable_x64 parity tests); under GSPMD the
            # batch-axis reduction is global, so stats are
            # effective-batch stats on any mesh
            acc = jnp.promote_types(jnp.float32, x.dtype)
            mean = jnp.mean(x, axes, dtype=acc)
            mu2 = jnp.mean(jnp.square(x.astype(acc)), axes)
            if self.phases > 1:
                mean = mean.reshape(self.phases, feats).mean(0)
                mu2 = mu2.reshape(self.phases, feats).mean(0)
            var = jnp.maximum(mu2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = self.phases
                for a in axes:
                    n *= x.shape[a]
                unbias = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * unbias
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        mean = mean.astype(self.dtype)
        bias_c = bias.astype(self.dtype)
        if self.phases > 1:
            mul = jnp.tile(mul, self.phases)
            mean = jnp.tile(mean, self.phases)
            bias_c = jnp.tile(bias_c, self.phases)
        return (x.astype(self.dtype) - mean) * mul + bias_c


def _bn(train: bool, name: str, dtype=jnp.float32):
    return TorchBatchNorm(use_running_average=not train, dtype=dtype,
                          name=name)


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) x 2. Ref layers.py:16-41.

    Accepts either a single NHWC tensor or a *pair* ``(skip, up)``. The
    pair form computes ``conv1(concat([skip, up]))`` as two convolutions
    with channel-sliced kernels summed — mathematically identical
    (convolution is linear in input channels, kernel param unchanged)
    but it never materializes the concatenated feature map in HBM, which
    matters on bandwidth-bound chips: the decoder concats at 512x512 are
    among the largest tensors in the model.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        import jax

        from unet_tpu.core.setup import env_flag
        from unet_tpu.ops.s2d import (conv3x3_s2d_w, s2d_profitable,
                                      s2d_variant)

        # Width-space-to-depth routing for the lane-underfilled 64->64
        # levels (see ops/s2d.py): parameter shapes/names are untouched —
        # the (3,3,Cin,Cout) kernel is lifted to the s2d layout at apply
        # time, so checkpoints and the torch-port mapping are unchanged.
        # DEFAULT OFF after honest end-to-end measurement: the per-op win
        # (4.83->4.15 ms fwd at 512^2 64->64) is real but each routed
        # conv pays two s2d<->logical relayouts of a 512^2 map at its
        # graph boundaries (~1-2 ms each; C=64 logical tensors are 2x
        # lane-padded in HBM), which chained microbenches hide because
        # adjacent d2s/s2d reshapes cancel across scan iterations.
        # Measured full model: train 116.3 -> 138.8 ms/step, infer
        # 206 -> 164 slices/s. See docs/DESIGN.md "Space-to-depth".
        use_s2d = env_flag('UNET_TPU_S2D', False)
        variant = s2d_variant(train)

        def routed(inp, kernel, cout):
            if use_s2d and s2d_profitable(inp.shape[2], inp.shape[-1],
                                          cout):
                return conv3x3_s2d_w(inp.astype(self.dtype), kernel,
                                     variant)
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        def apply3x3(mod, inp, cout):
            if not (use_s2d and s2d_profitable(inp.shape[2],
                                               inp.shape[-1], cout)):
                return mod(inp)
            # declare the module's kernel, then apply it via the s2d
            # layout (XLA DCEs the dummy call)
            mod(jnp.zeros((1, 4, 4, inp.shape[-1]), self.dtype))
            k = mod.variables['params']['kernel']
            return conv3x3_s2d_w(inp.astype(self.dtype),
                                 k.astype(self.dtype), variant)

        mid = self.mid_channels if self.mid_channels is not None else self.out_channels
        conv1 = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                        kernel_init=_TORCH_CONV_INIT,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name='conv1')
        if isinstance(x, (tuple, list)):
            a, b = x
            ca = a.shape[-1]
            cin = ca + b.shape[-1]
            if not train and env_flag('UNET_TPU_EVAL_CONCAT', False):
                # OPT-IN negative result (benchmarks/concat_bench.py +
                # end-to-end ablation): in isolation the materialized
                # concat + ONE mixed-channel conv beats the two sliced
                # square convs at the shallow levels (512^2 7.66 vs
                # 10.58 ms fwd — square C=64 convs are XLA's slow case)
                # and the pair form wins once gradients are in the
                # program. But in the FULL model eval the concat LOSES
                # (infer 206 -> 147 slices/s): the gate's multiply and
                # the resize epilogue fuse into the sliced consumer
                # convs, and materializing the concat breaks that
                # producer fusion. Same lesson as ops/s2d.py: per-op
                # wins must survive an end-to-end ablation.
                x = conv1(jnp.concatenate(
                    [a.astype(self.dtype), b.astype(self.dtype)], -1))
            else:
                # declare conv1's (3,3,cin,mid) kernel, then apply it as
                # two sliced convolutions (XLA DCEs the dummy call)
                conv1(jnp.zeros((1, 4, 4, cin), self.dtype))
                k = conv1.variables['params']['kernel'].astype(self.dtype)
                x = (routed(a, k[:, :, :ca], mid)
                     + routed(b, k[:, :, ca:], mid))
        else:
            x = apply3x3(conv1, x, mid)
        x = _bn(train, 'bn1', self.dtype)(x)
        x = nn.relu(x)
        conv2 = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False, kernel_init=_TORCH_CONV_INIT,
                        dtype=self.dtype,
                        param_dtype=jnp.float32, name='conv2')
        x = apply3x3(conv2, x, self.out_channels)
        x = _bn(train, 'bn2', self.dtype)(x)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool(2) -> DoubleConv. Ref layers.py:44-61.

    ``pre_pooled=True`` skips the pool: the producer already emitted a
    pooled map (the s2d whole-level path fuses the pool into its layout
    exit, see IncPoolS2D). The parameter tree is unchanged either way.
    """

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 pre_pooled: bool = False) -> jnp.ndarray:
        if not pre_pooled:
            x = max_pool(x)
        return DoubleConv(self.out_channels, dtype=self.dtype,
                          name='conv')(x, train)


class IncPoolS2D(nn.Module):
    """The whole level-0 encoder block resident in width-s2d layout:
    (Conv3x3 -> BN -> ReLU) x2 plus the FOLLOWING 2x2 max pool, with
    exactly ONE layout boundary (the decoder-skip d2s).

    Motivation (docs/DESIGN.md "Space-to-depth"): per-conv s2d routing
    showed a real per-op win at the lane-underfilled C=64 512^2 level
    (fwd 4.83 -> 4.15 ms) that was destroyed by two s2d<->logical
    relayouts per conv (~1-2 ms each). This block amortizes boundaries
    to the level granularity the r3 ablation prescribed:

      entry:  pure reshape of the (N, H, W, 1) INPUT (C=1 — the cheap
              side; the expensive C=64 relayout never happens)
      convs:  s2d-resident (ops/s2d.py conv3x3_s2d_raw), full-lane MXU
      BN:     phase-aggregated stats (TorchBatchNorm(phases=2)) —
              bit-compatible parameter/stat tree with the logical path
      skip:   one d2s for the decoder consumer (the only relayout)
      pool:   free exit — column-pair pooling is an elementwise max
              over the phase channel-halves (ops/s2d.py
              max_pool_s2d_exit), already at logical W/2

    Parameter tree is IDENTICAL to ``DoubleConv(name='inc')`` (conv1/
    bn1/conv2/bn2, logical kernel + per-logical-channel BN shapes), so
    checkpoints, the torch port, and the flag-off path interchange
    freely. Opt-in via UNET_TPU_S2D_LEVEL=1 pending the end-to-end TPU
    measurement (house rule). Ref semantics: unet/models/layers.py:16-61.
    """

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from unet_tpu.ops.s2d import (conv3x3_s2d_raw, d2s_w,
                                      max_pool_s2d_exit, s2d_variant,
                                      s2d_w)

        variant = s2d_variant(train)
        cin = x.shape[-1]
        conv1 = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False, kernel_init=_TORCH_CONV_INIT,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name='conv1')
        conv2 = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False, kernel_init=_TORCH_CONV_INIT,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name='conv2')
        # declare the logical kernels (XLA DCEs the dummy calls), then
        # apply them in s2d layout
        conv1(jnp.zeros((1, 4, 4, cin), self.dtype))
        conv2(jnp.zeros((1, 4, 4, self.out_channels), self.dtype))
        k1 = conv1.variables['params']['kernel']
        k2 = conv2.variables['params']['kernel']

        h = s2d_w(x.astype(self.dtype))
        h = conv3x3_s2d_raw(h, k1.astype(self.dtype), variant)
        h = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, phases=2, name='bn1')(h)
        h = nn.relu(h)
        h = conv3x3_s2d_raw(h, k2.astype(self.dtype), variant)
        h = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, phases=2, name='bn2')(h)
        h = nn.relu(h)
        return d2s_w(h), max_pool_s2d_exit(h)


class OutConv(nn.Module):
    """1x1 conv (with bias) to class logits. Ref layers.py:109-123."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       kernel_init=_TORCH_CONV_INIT,
                       bias_init=_torch_bias_init(x.shape[-1]),
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
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, (2, 2), strides=(2, 2), use_bias=True,
                kernel_init=_TORCH_CONVT_INIT,
                bias_init=_torch_bias_init((x1.shape[-1] // 2) * 4),
                dtype=self.dtype, param_dtype=jnp.float32, name='up')(x1)
            mid = None
        x1 = pad_to_match(x1, x2.shape[1], x2.shape[2])
        # [skip, up] order (ref layers.py:105); the concat is virtual —
        # DoubleConv's pair form slices the kernel instead.
        return DoubleConv(self.out_channels, mid_channels=mid,
                          dtype=self.dtype, name='conv')((x2, x1), train)


class _PsiReduce(nn.Module):
    """The gate's ψ: a bias-free 1x1 conv to ONE channel
    (ref layers.py:152-156).

    As a conv/matmul its N=1 output dim fills 1/128 of the MXU —
    profiled at 0.7 TFLOP/s, ~3 ms fwd + 4 ms bwd per b8/512² train
    step across the four gates. The identical contraction as a
    broadcast-multiply + lane reduction runs on the VPU and fuses with
    the surrounding elementwise work. The parameter keeps nn.Conv's
    exact name/shape/init ((1, 1, C, 1), torch-matched kaiming),
    so checkpoints and the torch-port mapping are unchanged.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        import jax

        c = a.shape[-1]
        kernel = self.param('kernel', _TORCH_CONV_INIT,
                            (1, 1, c, 1), jnp.float32)
        a = a.astype(self.dtype)
        from unet_tpu.core.setup import env_flag
        if env_flag('UNET_TPU_PSI_EINSUM',
                    jax.default_backend() == 'tpu'):
            k = kernel.reshape(c).astype(self.dtype)
            return jnp.einsum('nhwc,c->nhw', a, k)[..., None]
        # off-TPU: the same conv lowering nn.Conv used, so CPU golden
        # tests keep their exact pre-existing float ordering
        return jax.lax.conv_general_dilated(
            a, kernel.astype(self.dtype), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class AttentionGate(nn.Module):
    """Additive attention gate (Oktay et al.). Ref layers.py:126-192.

    attention = sigmoid(BN(psi(relu(BN(W_g g_up) + BN(W_x x)))))
    where g is first bilinearly upsampled (align-corners) to x's size
    (ref layers.py:183). All 1x1 convs are bias-free. Returns x * attention.
    inter_channels defaults to skip_channels // 2 (ref layers.py:147-148).

    A fused Pallas inference kernel is available
    (unet_tpu.ops.pallas.attention_gate): upsample + both 1x1 convs with
    BatchNorm folded + psi + sigmoid + gating in one VMEM-resident pass.
    Measured end-to-end it currently LOSES to XLA's whole-graph fusion
    (XLA folds the final gating multiply into the consumer conv; the
    kernel forces an extra HBM round-trip of the gated skip), so the
    default is off. ``use_fused``: None/False = XLA path, True = Pallas
    kernel (eval only; training always uses XLA — batch stats need a
    global reduction).
    """

    inter_channels: Optional[int] = None
    dtype: Any = jnp.float32
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        import jax

        inter = (self.inter_channels if self.inter_channels is not None
                 else x.shape[-1] // 2)
        w_g = nn.Conv(inter, (1, 1), use_bias=False,
                      kernel_init=_TORCH_CONV_INIT, dtype=self.dtype,
                      param_dtype=jnp.float32, name='w_g')
        bn_g = _bn(train, 'bn_g', self.dtype)
        w_x = nn.Conv(inter, (1, 1), use_bias=False,
                      kernel_init=_TORCH_CONV_INIT, dtype=self.dtype,
                      param_dtype=jnp.float32, name='w_x')
        bn_x = _bn(train, 'bn_x', self.dtype)
        psi = _PsiReduce(dtype=self.dtype, name='psi')
        bn_psi = _bn(train, 'bn_psi', self.dtype)

        from unet_tpu.ops.pallas.attention_gate import fused_shapes_supported

        fused = bool(self.use_fused) and jax.default_backend() == 'tpu'
        fused = (fused and not train and not self.is_initializing()
                 and fused_shapes_supported(g.shape, x.shape))
        if fused:
            # Declare every submodule's variables (shapes only), then
            # read them for BN folding into the fused kernel.
            zg = jnp.zeros((1, 1, 1, g.shape[-1]), self.dtype)
            zx = jnp.zeros((1, 1, 1, x.shape[-1]), self.dtype)
            zi = jnp.zeros((1, 1, 1, inter), self.dtype)
            bn_g(w_g(zg))
            bn_x(w_x(zx))
            bn_psi(psi(zi))

            from unet_tpu.ops.pallas.attention_gate import (
                attention_gate_fused, fold_bn_into_conv)

            def folded(conv, bn):
                p = bn.variables['params']
                s = bn.variables['batch_stats']
                k = conv.variables['params']['kernel']
                co = k.shape[-1]
                return fold_bn_into_conv(
                    k.reshape(k.shape[-2], co), p['scale'], p['bias'],
                    s['mean'], s['var'], _BN_EPS)
            kg, bg = folded(w_g, bn_g)
            kx, bx = folded(w_x, bn_x)
            kp, bp = folded(psi, bn_psi)
            return attention_gate_fused(
                g, x, kg.astype(x.dtype), kx.astype(x.dtype),
                (bg + bx).astype(jnp.float32), kp.astype(x.dtype),
                bp[0])

        # The reference computes BN(W_g(.)) on the UPSAMPLED gate
        # (ref layers.py:183-187). The 1x1 conv is linear, so it commutes
        # exactly with bilinear interpolation — we always run it at low
        # resolution (~4x fewer gate-conv FLOPs). BN only commutes when
        # it is a pure per-channel affine (eval mode): in train mode its
        # batch mean/var must be computed from the upsampled map or the
        # normalization and the stored running stats diverge from the
        # reference's. Hence: eval normalizes low-res then upsamples;
        # train upsamples first, then applies BN.
        if train:
            g1 = resize_bilinear_align_corners(w_g(g), x.shape[1],
                                               x.shape[2])
            g1 = bn_g(g1)
        else:
            g1 = bn_g(w_g(g))
            g1 = resize_bilinear_align_corners(g1, x.shape[1], x.shape[2])
        x1 = bn_x(w_x(x))
        a = nn.relu(g1 + x1)
        a = nn.sigmoid(bn_psi(psi(a)))
        return x * a.astype(x.dtype)


class AttentionUp(nn.Module):
    """AttentionGate on the skip (gated by the un-upsampled decoder map,
    ref layers.py:240-241), then Up-style upsample/pad/concat/DoubleConv.
    Ref layers.py:195-255.
    """

    out_channels: int
    bilinear: bool = True
    dtype: Any = jnp.float32
    use_fused_gate: Optional[bool] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x2_att = AttentionGate(dtype=self.dtype, name='attention',
                               use_fused=self.use_fused_gate)(
            x1, x2, train)
        if self.bilinear:
            x1 = upsample2x_align_corners(x1)
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, (2, 2), strides=(2, 2), use_bias=True,
                kernel_init=_TORCH_CONVT_INIT,
                bias_init=_torch_bias_init((x1.shape[-1] // 2) * 4),
                dtype=self.dtype, param_dtype=jnp.float32, name='up')(x1)
            mid = None
        x1 = pad_to_match(x1, x2_att.shape[1], x2_att.shape[2])
        return DoubleConv(self.out_channels, mid_channels=mid,
                          dtype=self.dtype, name='conv')((x2_att, x1),
                                                         train)
