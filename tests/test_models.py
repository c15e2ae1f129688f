"""Model parity tests: parameter counts, output contracts, and (when the
reference repo is mounted) numerical forward parity via weight porting."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.models import AttentionUNet, UNet, create_model

REF = Path('/root/reference')

# Exact parameter counts of the reference torch models
# (n_channels=1, n_classes=2, base_features=64), measured once from
# unet/models/unet.py. BatchNorm running stats are buffers (not params)
# in both frameworks.
PARAM_COUNTS = {
    ('unet', True): 17_261_890,
    ('unet', False): 31_036_546,
    ('attention_unet', True): 17_612_458,
    ('attention_unet', False): 31_561_194,
}
ATTENTION_DS_BILINEAR = 17_613_360


def _n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


def _init(model, hw=32):
    x = jnp.zeros((1, hw, hw, model.n_channels), jnp.float32)
    return model.init(jax.random.key(0), x, train=False)


def _init_shapes(model, hw=32):
    x = jax.ShapeDtypeStruct((1, hw, hw, model.n_channels), jnp.float32)
    # close over `train` so eval_shape doesn't trace it as a value
    return jax.eval_shape(lambda k, x: model.init(k, x, train=False),
                          jax.random.key(0), x)


@pytest.mark.parametrize('model_type,bilinear', list(PARAM_COUNTS))
def test_param_count_parity(model_type, bilinear):
    model = create_model(model_type, bilinear=bilinear)
    variables = _init_shapes(model)
    assert _n_params(variables['params']) == PARAM_COUNTS[(model_type, bilinear)]


def test_param_count_deep_supervision():
    model = AttentionUNet(deep_supervision=True)
    variables = _init_shapes(model)
    assert _n_params(variables['params']) == ATTENTION_DS_BILINEAR


@pytest.mark.parametrize('model_type,bilinear', list(PARAM_COUNTS))
def test_get_num_params_api(model_type, bilinear):
    """`get_num_params` helper parity (ref unet/models/unet.py:94-106):
    both flag values count the parameter collection (every reference
    parameter has requires_grad=True; BN stats are buffers there too)."""
    model = create_model(model_type, bilinear=bilinear)
    variables = _init_shapes(model)
    want = PARAM_COUNTS[(model_type, bilinear)]
    assert model.get_num_params(variables) == want
    assert model.get_num_params(variables, trainable_only=False) == want


@pytest.mark.parametrize('model_type', ['unet', 'attention_unet'])
@pytest.mark.parametrize('bilinear', [True, False])
def test_output_shape(model_type, bilinear):
    model = create_model(model_type, bilinear=bilinear, base_features=8)
    variables = _init_shapes(model, hw=64)
    x = jax.ShapeDtypeStruct((2, 64, 64, 1), jnp.float32)
    y = jax.eval_shape(lambda v, x: model.apply(v, x, train=False),
                       variables, x)
    assert y.shape == (2, 64, 64, 2)
    assert y.dtype == jnp.float32


def test_deep_supervision_contract():
    model = AttentionUNet(base_features=8, deep_supervision=True)
    variables = _init(model, hw=64)
    x = jnp.ones((2, 64, 64, 1))
    outs, _ = model.apply(variables, x, train=True,
                          mutable=['batch_stats'])
    assert isinstance(outs, tuple) and len(outs) == 4
    for o in outs:
        assert o.shape == (2, 64, 64, 2)
    # eval mode: single tensor (ref unet.py:211)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 2)


def test_batch_stats_updated_in_train_mode():
    model = UNet(base_features=8)
    variables = _init(model, hw=32)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    _, updates = model.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    before = jax.tree.leaves(variables['batch_stats'])
    after = jax.tree.leaves(updates['batch_stats'])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_path():
    model = UNet(base_features=8, dtype=jnp.bfloat16)
    variables = _init(model, hw=32)
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # logits promoted back to f32
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
@pytest.mark.parametrize('model_type,bilinear', [
    ('unet', True), ('unet', False),
    ('attention_unet', True), ('attention_unet', False),
])
def test_forward_parity_with_reference(model_type, bilinear, rng):
    """Port reference torch weights into the flax model and compare logits."""
    torch = pytest.importorskip('torch')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.models import UNet as TUNet, AttentionUNet as TAttentionUNet
    from unet_tpu.utils.torch_port import convert_torch_state_dict

    tcls = TUNet if model_type == 'unet' else TAttentionUNet
    tmodel = tcls(n_channels=1, n_classes=2, bilinear=bilinear,
                  base_features=8)
    tmodel.eval()

    model = create_model(model_type, bilinear=bilinear, base_features=8)
    variables = _init(model, hw=48)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables)

    x = rng.standard_normal((2, 48, 48, 1), dtype=np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    # tolerance: XLA-CPU and torch convs use different reduction orders, so
    # fp32 noise of O(1e-4) accumulates across the 23-conv stack; wiring
    # errors would produce O(1) differences.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
def test_train_mode_forward_parity_attention(rng):
    """Train-mode forward parity for AttentionUNet, including every BN
    running-stat update. Guards the gate's BN ordering (ref
    layers.py:183-186): bn_g's batch statistics must come from the
    UPSAMPLED gate map — the 1x1-conv/bilinear commute is exact, the
    batch-statistics commute is not (low-res stats differ ~2x)."""
    torch = pytest.importorskip('torch')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.models import AttentionUNet as TAttentionUNet

    from flax.traverse_util import flatten_dict
    from unet_tpu.utils.torch_port import _torch_prefix, convert_torch_state_dict

    tmodel = TAttentionUNet(n_channels=1, n_classes=2, bilinear=True,
                            base_features=8)
    tmodel.train()
    model = create_model('attention_unet', bilinear=True, base_features=8)
    variables = _init(model, hw=32)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables)

    x = rng.standard_normal((2, 32, 32, 1), dtype=np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    got, updates = model.apply(variables, jnp.asarray(x), train=True,
                               mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-3)

    # the torch forward above updated its running stats in place; every
    # flax running mean/var must match (this is what catches stats
    # computed at the wrong resolution)
    tstate = {k: np.asarray(v) for k, v in tmodel.state_dict().items()}
    checked = 0
    for path, v in flatten_dict(updates['batch_stats']).items():
        *mods, leaf = path
        prefix = _torch_prefix(tuple(mods))
        name = {'mean': 'running_mean', 'var': 'running_var'}[leaf]
        tv = tstate[f'{prefix}.{name}']
        scale = max(np.abs(tv).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(v) / scale, tv / scale,
                                   atol=5e-3, err_msg=str(path))
        checked += 1
    assert checked > 40


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
@pytest.mark.parametrize('model_type', ['unet', 'attention_unet'])
def test_gradient_parity_with_reference(model_type, rng):
    """Port reference weights, run one train-mode forward+backward with
    the dice_bce loss in both frameworks on the same batch, and compare
    parameter gradients. Verifies conv/BN backward wiring, the custom
    upsample VJP, the virtual-concat kernel slicing, the attention-gate
    train-mode BN ordering, and the fused binary loss in one shot."""
    torch = pytest.importorskip('torch')
    # pin the torch side: oneDNN threaded reductions are run-to-run
    # nondeterministic at the ~1e-7 level, which the deep BN chains
    # amplify into occasional ~1e-2 per-element gradient drift (flaky
    # near-tolerance failures observed only in full-suite runs)
    torch.set_num_threads(1)
    try:
        torch.use_deterministic_algorithms(True)
    except Exception:
        pass
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.models import UNet as TUNet, AttentionUNet as TAttentionUNet
    from unet.utils.loss import DiceBCELoss

    from unet_tpu.train.losses import dice_bce_loss
    from unet_tpu.utils.torch_port import convert_torch_state_dict

    tcls = TUNet if model_type == 'unet' else TAttentionUNet
    tmodel = tcls(n_channels=1, n_classes=2, bilinear=True,
                  base_features=8)
    tmodel.train()
    model = create_model(model_type, bilinear=True, base_features=8)
    variables = _init(model, hw=32)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables)

    x = rng.standard_normal((2, 32, 32, 1), dtype=np.float32)
    y = (rng.random((2, 32, 32)) > 0.8).astype(np.int64)

    # torch grads
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(False)
    loss_t = DiceBCELoss()(tmodel(xt), torch.from_numpy(y))
    loss_t.backward()

    # jax grads
    def loss_of(params):
        logits, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            jnp.asarray(x), train=True, mutable=['batch_stats'])
        return dice_bce_loss(logits, jnp.asarray(y))
    loss_j, grads = jax.value_and_grad(loss_of)(variables['params'])

    np.testing.assert_allclose(float(loss_j), float(loss_t.item()),
                               rtol=1e-4)

    from unet_tpu.utils.torch_port import _torch_prefix
    from flax.traverse_util import flatten_dict
    tgrads = {n: p.grad for n, p in tmodel.named_parameters()}
    checked = 0
    for path, g in flatten_dict(grads).items():
        *mods, leaf = path
        prefix = _torch_prefix(tuple(mods))
        name = {'kernel': 'weight', 'scale': 'weight',
                'bias': 'bias'}[leaf]
        tg = tgrads[f'{prefix}.{name}'].numpy()
        if leaf == 'kernel':
            tg = tg.transpose(2, 3, 1, 0)
        g = np.asarray(g)
        scale = max(np.abs(tg).max(), 1e-6)
        # atol 2e-2: per-parameter grads amplify ~1e-7 float-ordering
        # noise (jax vs torch reduce in different orders) through the
        # BN chains; observed drift on single BN-bias/psi-kernel
        # elements reaches 1.1e-2 depending on the XLA:CPU op lowerings
        # in use (deterministically order-dependent: the same element
        # lands at 7e-3 in isolation and 1.08e-2 when the suite's
        # Pallas interpret-mode tests compile first), with no semantic
        # difference (loss parity above is rtol 1e-4). Structural
        # gradient errors produce O(1) deviations, far above this.
        np.testing.assert_allclose(g / scale, tg / scale, atol=2e-2,
                                   err_msg=str(path))
        checked += 1
    assert checked > 40


def test_psi_einsum_matches_conv_lowering(rng, monkeypatch):
    """_PsiReduce's TPU einsum path (VPU lane-reduction) must equal the
    conv lowering it replaces, forward and gradient."""
    import jax
    import jax.numpy as jnp
    from unet_tpu.models.layers import _PsiReduce

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    mod = _PsiReduce()
    v = mod.init(jax.random.key(0), x)

    def run():
        out = mod.apply(v, x)
        g = jax.grad(lambda t: jnp.sum(jnp.sin(mod.apply(v, t))))(x)
        gk = jax.grad(lambda p: jnp.sum(jnp.cos(mod.apply(p, x))))(v)
        return out, g, gk

    monkeypatch.setenv('UNET_TPU_PSI_EINSUM', '0')
    o1, g1, gk1 = run()
    monkeypatch.setenv('UNET_TPU_PSI_EINSUM', '1')
    o2, g2, gk2 = run()
    assert o1.shape == o2.shape == (2, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
    k1 = jax.tree.leaves(gk1)[0]
    k2 = jax.tree.leaves(gk2)[0]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-5, atol=1e-5)
