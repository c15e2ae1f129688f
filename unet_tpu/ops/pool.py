"""2x2/stride-2 max pooling with an elementwise backward.

The reference uses ``nn.MaxPool2d(2)`` between encoder levels
(reference unet/models/layers.py:50-55). flax's ``nn.max_pool`` lowers
the backward to XLA ``select_and_scatter`` — profiled at 2.4 ms of the
b8/512² train step. For the non-overlapping 2x2/stride-2 case the
gradient is expressible entirely elementwise: route each output
gradient to the FIRST maximal element of its window in row-major order
— exactly ``select_and_scatter``'s (and torch's argmax-based) tie
semantics — via cascaded equality masks on the four strided phases.

**Measured r2: a net LOSS.** The stride-2 W-axis phase slices are
lane-misaligned on TPU, so the "elementwise" formulation costs more in
relayouts than the 2.4 ms it saves: attention train step 116 → 128 ms,
plain UNet 92 → 104 ms. ``max_pool`` therefore defaults to flax's
reduce_window lowering; the custom path stays available behind
``UNET_TPU_ELEMENTWISE_POOL=1`` as a tested negative-result artifact
(its tie-semantics parity tests in tests/test_resize.py remain useful
documentation of the routing rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _phases(x: jnp.ndarray):
    """The four 2x2-window phases as strided views. x: (N, H, W, C)."""
    return (x[:, 0::2, 0::2], x[:, 0::2, 1::2],
            x[:, 1::2, 0::2], x[:, 1::2, 1::2])


def _interleave(d00, d01, d10, d11):
    """Inverse of _phases: (N, H/2, W/2, C) x4 -> (N, H, W, C)."""
    n, h2, w2, c = d00.shape
    row0 = jnp.stack([d00, d01], axis=3).reshape(n, h2, 2 * w2, c)
    row1 = jnp.stack([d10, d11], axis=3).reshape(n, h2, 2 * w2, c)
    return jnp.stack([row0, row1], axis=2).reshape(n, 2 * h2, 2 * w2, c)


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """max_pool(window=2x2, strides=2x2, VALID) for even H and W."""
    e00, e01, e10, e11 = _phases(x)
    return jnp.maximum(jnp.maximum(e00, e01), jnp.maximum(e10, e11))


def _mp_fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    e00, e01, e10, e11 = _phases(x)
    m00 = e00 == y
    m01 = (e01 == y) & ~m00
    m10 = (e10 == y) & ~m00 & ~m01
    m11 = (e11 == y) & ~m00 & ~m01 & ~m10
    z = g.dtype.type(0)
    return (_interleave(jnp.where(m00, g, z), jnp.where(m01, g, z),
                        jnp.where(m10, g, z), jnp.where(m11, g, z)),)


max_pool_2x2.defvjp(_mp_fwd, _mp_bwd)


def max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``nn.max_pool(x, (2, 2), (2, 2))``. Defaults to the
    reduce_window lowering (measured faster end-to-end — see module
    docstring); ``UNET_TPU_ELEMENTWISE_POOL=1`` opts into the
    elementwise-backward kernel (even H/W only)."""
    from unet_tpu.core.setup import env_flag
    if (env_flag('UNET_TPU_ELEMENTWISE_POOL', False)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return max_pool_2x2(x)
    import flax.linen as nn
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
