"""Pallas kernel golden tests (interpret mode on CPU, SURVEY.md §4e)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.ops.pallas.attention_gate import (
    attention_gate_fused,
    attention_gate_reference,
    fold_bn_into_conv,
    fused_shapes_supported,
)


def _case(rng, gs, xs):
    cg, cx = gs[-1], xs[-1]
    inter = cx // 2
    mk = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32))
    return (mk(*gs), mk(*xs), mk(cg, inter) * 0.1, mk(cx, inter) * 0.1,
            mk(inter) * 0.1, mk(inter, 1) * 0.1, 0.05)


@pytest.mark.parametrize('gs,xs', [
    ((2, 16, 16, 32), (2, 32, 32, 16)),
    ((1, 16, 16, 64), (1, 32, 32, 64)),    # cg < 128 padding path
    ((2, 32, 32, 128), (2, 64, 64, 64)),
])
def test_fused_gate_matches_reference(gs, xs, rng):
    args = _case(rng, gs, xs)
    want = np.asarray(attention_gate_reference(*args))
    got = np.asarray(attention_gate_fused(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fold_bn_into_conv(rng):
    cin, cout = 8, 4
    k = jnp.asarray(rng.standard_normal((cin, cout), dtype=np.float32))
    scale = jnp.asarray(rng.random(cout, dtype=np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    mean = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    var = jnp.asarray(rng.random(cout, dtype=np.float32) + 0.1)
    x = jnp.asarray(rng.standard_normal((5, cin), dtype=np.float32))
    kf, bf = fold_bn_into_conv(k, scale, bias, mean, var, eps=1e-5)
    got = x @ kf + bf
    want = scale * (x @ k - mean) * jax.lax.rsqrt(var + 1e-5) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_shape_guard():
    assert fused_shapes_supported((1, 32, 32, 512), (1, 64, 64, 512))
    assert not fused_shapes_supported((1, 4, 4, 512), (1, 8, 8, 512))
    # non-2x ratios exceed the kernel's rg-row DMA window
    assert not fused_shapes_supported((1, 32, 32, 512), (1, 128, 128, 512))
    assert not fused_shapes_supported((1, 32, 32, 512), (1, 64, 128, 512))


def test_module_fused_path_matches_xla(monkeypatch, rng):
    """AttentionGate(use_fused=True) through the Flax module (folding BN
    from real running stats) must match the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from unet_tpu.models.layers import AttentionGate

    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    g = jnp.asarray(rng.standard_normal((1, 16, 16, 32), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 16), dtype=np.float32))

    gate_off = AttentionGate(use_fused=False)
    variables = gate_off.init(jax.random.key(0), g, x, train=False)
    # give the BN stats non-trivial values so folding is actually tested
    variables = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.key(1), a.shape),
        variables)
    want = gate_off.apply(variables, g, x, train=False)

    gate_on = AttentionGate(use_fused=True)
    with pltpu.force_tpu_interpret_mode():
        got = gate_on.apply(variables, g, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
