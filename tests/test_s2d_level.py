"""Golden tests for the whole-level s2d encoder block (IncPoolS2D +
max_pool_s2d_exit + TorchBatchNorm(phases=2)) against the logical path.

The r3 per-conv s2d ablation lost end-to-end because every routed conv
paid two layout boundaries; IncPoolS2D amortizes them to one per level
(see layers.py docstring). These tests pin exact semantics: identical
parameter/stat trees, forward/grad/stat parity in train and eval mode,
tie-exact pool gradients, and full-model interchangeability — so the
TPU ablation only has to answer the SPEED question.
"""

import os
import zlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.models.layers import DoubleConv, IncPoolS2D, TorchBatchNorm
from unet_tpu.models.unet import AttentionUNet
from unet_tpu.ops.pool import max_pool
from unet_tpu.ops.s2d import d2s_w, max_pool_s2d_exit, s2d_w


def _rng(tag):
    return np.random.default_rng(zlib.crc32(tag.encode()))


def _x(tag, n=2, h=16, w=16, c=1):
    return jnp.asarray(_rng(tag).standard_normal((n, h, w, c)),
                       jnp.float32)


# ---------------------------------------------------------------------
# max_pool_s2d_exit
# ---------------------------------------------------------------------

def test_s2d_pool_forward_matches_logical():
    x = _x('pool-fwd', 3, 12, 20, 8)
    want = np.asarray(max_pool(x))
    got = np.asarray(max_pool_s2d_exit(s2d_w(x)))
    np.testing.assert_array_equal(got, want)


def test_s2d_pool_gradient_ties_route_first_max():
    """Windows full of EXACT ties (constant blocks) must route the whole
    gradient to the first window element in row-major order — the
    select_and_scatter rule the default path uses."""
    x = jnp.ones((1, 4, 4, 2), jnp.float32)

    def f(t):
        return jnp.sum(max_pool_s2d_exit(s2d_w(t)) *
                       jnp.arange(1.0, 9.0).reshape(1, 2, 2, 2))
    g = np.asarray(jax.grad(f)(x))
    # gradient lands ONLY on the top-left element of each 2x2 window
    assert np.all(g[0, 0::2, 0::2] != 0)
    assert np.count_nonzero(g) == 8


def test_s2d_pool_gradient_matches_logical_on_generic_input():
    x = _x('pool-grad', 2, 8, 8, 4)
    tgt = jnp.asarray(_rng('pool-tgt').standard_normal((2, 4, 4, 4)),
                      jnp.float32)

    g1 = jax.grad(lambda t: jnp.sum(max_pool(t) * tgt))(x)
    g2 = jax.grad(
        lambda t: jnp.sum(max_pool_s2d_exit(s2d_w(t)) * tgt))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)


# ---------------------------------------------------------------------
# TorchBatchNorm(phases=2)
# ---------------------------------------------------------------------

@pytest.mark.parametrize('train', [True, False])
def test_phase_bn_matches_logical_bn(train):
    x = _x('bn', 2, 8, 10, 6)
    bn1 = TorchBatchNorm(use_running_average=not train)
    bn2 = TorchBatchNorm(use_running_average=not train, phases=2)
    v1 = bn1.init(jax.random.key(0), x)
    v2 = bn2.init(jax.random.key(0), s2d_w(x))
    # identical tree: per-LOGICAL-channel shapes on both
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
    # seed non-trivial scale/bias/stats
    rng = _rng('bn-params')
    v = {'params': {'scale': jnp.asarray(rng.uniform(0.5, 2, 6), jnp.float32),
                    'bias': jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)},
         'batch_stats': {'mean': jnp.asarray(rng.uniform(-1, 1, 6),
                                             jnp.float32),
                         'var': jnp.asarray(rng.uniform(0.5, 2, 6),
                                            jnp.float32)}}
    y1, upd1 = bn1.apply(v, x, mutable=['batch_stats'])
    y2, upd2 = bn2.apply(v, s2d_w(x), mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(d2s_w(y2)), np.asarray(y1),
                               atol=1e-6)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(upd2['batch_stats'][k]),
            np.asarray(upd1['batch_stats'][k]), atol=1e-6)


# ---------------------------------------------------------------------
# IncPoolS2D vs DoubleConv + max_pool
# ---------------------------------------------------------------------

def _logical_ref(params_stats, x, train):
    dc = DoubleConv(8)
    if train:
        y, upd = dc.apply(params_stats, x, True, mutable=['batch_stats'])
    else:
        y, upd = dc.apply(params_stats, x, False), {'batch_stats': {}}
    return y, max_pool(y), upd


@pytest.mark.parametrize('train', [True, False])
def test_incpool_s2d_matches_doubleconv(train):
    x = _x('inc', 2, 12, 16, 1)
    blk = IncPoolS2D(8)
    v_s2d = blk.init(jax.random.key(3), x, train=True)
    v_log = DoubleConv(8).init(jax.random.key(3), x, train=True)
    assert (jax.tree_util.tree_structure(v_s2d)
            == jax.tree_util.tree_structure(v_log))
    # same init draws (same param names/shapes under the same rng)
    for a, b in zip(jax.tree_util.tree_leaves(v_s2d),
                    jax.tree_util.tree_leaves(v_log)):
        assert a.shape == b.shape

    # run BOTH paths from the logical init (interchangeable weights)
    want_skip, want_pool, want_upd = _logical_ref(v_log, x, train)
    if train:
        (skip, pooled), upd = blk.apply(v_log, x, train,
                                        mutable=['batch_stats'])
    else:
        skip, pooled = blk.apply(v_log, x, train)
        upd = None
    np.testing.assert_allclose(np.asarray(skip), np.asarray(want_skip),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               atol=2e-5)
    if train:
        for mod in ('bn1', 'bn2'):
            for k in ('mean', 'var'):
                np.testing.assert_allclose(
                    np.asarray(upd['batch_stats'][mod][k]),
                    np.asarray(want_upd['batch_stats'][mod][k]),
                    atol=2e-5)


def test_incpool_s2d_gradients_match():
    x = _x('inc-grad', 2, 8, 8, 1)
    v = DoubleConv(8).init(jax.random.key(4), x, train=True)
    t_skip = jnp.asarray(_rng('t1').standard_normal((2, 8, 8, 8)),
                         jnp.float32)
    t_pool = jnp.asarray(_rng('t2').standard_normal((2, 4, 4, 8)),
                         jnp.float32)

    def loss_logical(p, t):
        y, _ = DoubleConv(8).apply({**v, 'params': p}, t, True,
                                   mutable=['batch_stats'])
        return jnp.sum(y * t_skip) + jnp.sum(max_pool(y) * t_pool)

    def loss_s2d(p, t):
        (skip, pooled), _ = IncPoolS2D(8).apply(
            {**v, 'params': p}, t, True, mutable=['batch_stats'])
        return jnp.sum(skip * t_skip) + jnp.sum(pooled * t_pool)

    g1p, g1x = jax.grad(loss_logical, argnums=(0, 1))(v['params'], x)
    g2p, g2x = jax.grad(loss_s2d, argnums=(0, 1))(v['params'], x)
    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2x), np.asarray(g1x),
                               atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------
# Full-model wiring under the env flag
# ---------------------------------------------------------------------

def test_full_model_parity_under_flag(monkeypatch):
    """AttentionUNet with UNET_TPU_S2D_LEVEL=1 must produce the same
    logits, gradients, and stat updates as the logical path, from the
    SAME checkpoint (tree compatibility is the contract)."""
    x = _x('model', 2, 16, 16, 1)
    model = AttentionUNet(n_channels=1, n_classes=2, base_features=4,
                          bilinear=True, deep_supervision=False)
    v = model.init(jax.random.key(5), x, train=True)

    def run(t, train):
        if train:
            y, upd = model.apply(v, t, train=True,
                                 mutable=['batch_stats'])
            return y, upd
        return model.apply(v, t, train=False), None

    monkeypatch.delenv('UNET_TPU_S2D_LEVEL', raising=False)
    y0, upd0 = run(x, True)
    e0, _ = run(x, False)
    g0 = jax.grad(lambda p: jnp.sum(model.apply(
        {**v, 'params': p}, x, train=True,
        mutable=['batch_stats'])[0] ** 2))(v['params'])

    monkeypatch.setenv('UNET_TPU_S2D_LEVEL', '1')
    y1, upd1 = run(x, True)
    e1, _ = run(x, False)
    g1 = jax.grad(lambda p: jnp.sum(model.apply(
        {**v, 'params': p}, x, train=True,
        mutable=['batch_stats'])[0] ** 2))(v['params'])

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(upd0),
                    jax.tree_util.tree_leaves(upd1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    # f32 summation-order drift compounds through 4 levels of convs +
    # BN rsqrt in this tiny (b=2, f=4) net: measured max 2.8% rel on
    # isolated elements. That it IS pure ordering noise is proven by
    # test_full_model_exact_in_f64 (8e-12 rel with f64 accumulation).
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-1, rtol=5e-2)


def test_full_model_exact_in_f64(monkeypatch):
    """With f64 accumulation the two paths are numerically IDENTICAL:
    forward bit-exact, stats ~1e-15, grads ~1e-11 — the whole-level s2d
    rewrite is semantics-preserving; every f32 difference elsewhere in
    this file is summation order, not math."""
    with jax.enable_x64(True):
        x = jnp.asarray(_rng('model').standard_normal((2, 16, 16, 1)),
                        jnp.float64)
        model = AttentionUNet(n_channels=1, n_classes=2, base_features=4,
                              bilinear=True, deep_supervision=False,
                              dtype=jnp.float64)
        v = model.init(jax.random.key(5), x, train=True)
        v = jax.tree.map(lambda a: a.astype(jnp.float64), v)

        def run():
            y, u = model.apply(v, x, train=True, mutable=['batch_stats'])
            g = jax.grad(lambda p: jnp.sum(model.apply(
                {**v, 'params': p}, x, train=True,
                mutable=['batch_stats'])[0] ** 2))(v['params'])
            return y, u, g

        monkeypatch.delenv('UNET_TPU_S2D_LEVEL', raising=False)
        y0, u0, g0 = run()
        monkeypatch.setenv('UNET_TPU_S2D_LEVEL', '1')
        y1, u1, g1 = run()
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    for a, b in zip(jax.tree_util.tree_leaves(u0),
                    jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9)


def test_flag_off_is_the_default():
    assert os.environ.get('UNET_TPU_S2D_LEVEL') is None
