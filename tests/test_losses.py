"""Loss tests: hand-computed small-tensor checks plus golden comparison
against the reference torch losses when the reference repo is mounted."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from unet_tpu.train.losses import (
    balanced_ce_loss,
    create_loss_function,
    cross_entropy_loss,
    deep_supervision_loss,
    dice_bce_loss,
    dice_loss,
)

REF = Path('/root/reference')


def _rand_case(rng, n=3, h=16, w=16, c=2):
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32) * 2
    targets = (rng.random((n, h, w)) > 0.8).astype(np.int64)
    return logits, targets


def test_dice_loss_perfect_prediction():
    # Huge logits on the correct class -> dice ~ 1 -> loss ~ 0
    targets = np.zeros((1, 8, 8), np.int64)
    targets[0, 2:5, 2:5] = 1
    logits = np.full((1, 8, 8, 2), -20.0, np.float32)
    logits[..., 0] = np.where(targets[0] == 0, 20.0, -20.0)
    logits[..., 1] = np.where(targets[0] == 1, 20.0, -20.0)
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert loss < 1e-3


def test_balanced_ce_weights_sum_to_one_per_image(rng):
    # With uniform logits, ce = log(2) per pixel and weights sum to 1 per
    # image -> loss = log(2).
    logits = np.zeros((2, 8, 8, 2), np.float32)
    targets = (rng.random((2, 8, 8)) > 0.5).astype(np.int64)
    loss = float(balanced_ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(loss, np.log(2.0), rtol=1e-5)


def test_deep_supervision_weighting(rng):
    logits, targets = _rand_case(rng)
    base = lambda p, t: dice_loss(p, t)
    preds = [jnp.asarray(logits)] * 4
    got = float(deep_supervision_loss(base, preds, jnp.asarray(targets)))
    single = float(base(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, single * (1.0 + 0.4 + 0.2 + 0.1),
                               rtol=1e-6)


@pytest.mark.parametrize('kind', ['dice', 'ce', 'balanced_ce', 'dice_bce'])
def test_sample_weights_match_unpadded(kind, rng):
    """Padded batch + 0/1 sample weights == loss over only the real rows
    (the multi-host eval contract: pad rows must not perturb a monitored
    'loss')."""
    logits, targets = _rand_case(rng, n=5)
    fn = create_loss_function(loss_type=kind)
    real = fn(jnp.asarray(logits[:3]), jnp.asarray(targets[:3]))
    # pad rows duplicate the last real sample, weight 0
    pl = np.concatenate([logits[:3], logits[2:3], logits[2:3]])
    pt = np.concatenate([targets[:3], targets[2:3], targets[2:3]])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    padded = fn(jnp.asarray(pl), jnp.asarray(pt), sample_weights=w)
    np.testing.assert_allclose(float(padded), float(real), rtol=1e-6)
    # all-ones weights == unweighted
    ones = fn(jnp.asarray(logits), jnp.asarray(targets),
              sample_weights=jnp.ones((5,)))
    base = fn(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ones), float(base), rtol=1e-6)


def test_sample_weights_class_weighted_ce(rng):
    logits, targets = _rand_case(rng, n=4)
    cw = [0.3, 0.7]
    real = cross_entropy_loss(jnp.asarray(logits[:2]),
                              jnp.asarray(targets[:2]), cw)
    pl = np.concatenate([logits[:2], logits[1:2]])
    pt = np.concatenate([targets[:2], targets[1:2]])
    padded = cross_entropy_loss(jnp.asarray(pl), jnp.asarray(pt), cw,
                                sample_weights=jnp.asarray([1.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(padded), float(real), rtol=1e-6)


def test_factory_unknown_raises():
    with pytest.raises(ValueError):
        create_loss_function('focal_tversky')


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
@pytest.mark.parametrize('kind', ['dice', 'ce', 'ce_weighted', 'balanced_ce',
                                  'dice_bce'])
def test_losses_match_reference(kind, rng):
    torch = pytest.importorskip('torch')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.utils.loss import (BalancedCELoss, DiceBCELoss, DiceLoss)

    logits, targets = _rand_case(rng)
    tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(targets)
    jl, jt = jnp.asarray(logits), jnp.asarray(targets)

    if kind == 'dice':
        want = DiceLoss(ignore_background=True)(tl, tt).item()
        got = float(dice_loss(jl, jt))
    elif kind == 'ce':
        want = torch.nn.CrossEntropyLoss()(tl, tt).item()
        got = float(cross_entropy_loss(jl, jt))
    elif kind == 'ce_weighted':
        w = [0.3, 0.7]
        want = torch.nn.CrossEntropyLoss(
            weight=torch.tensor(w))(tl, tt).item()
        got = float(cross_entropy_loss(jl, jt, class_weights=w))
    elif kind == 'balanced_ce':
        want = BalancedCELoss(class_weight=0.6)(tl, tt).item()
        got = float(balanced_ce_loss(jl, jt, class_weight=0.6))
    else:
        want = DiceBCELoss(ce_weight=0.8, dice_weight=1.2,
                           class_weight=0.4)(tl, tt).item()
        got = float(dice_bce_loss(jl, jt, ce_weight=0.8, dice_weight=1.2,
                                  class_weight=0.4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
def test_balanced_ce_all_background_matches_reference(rng):
    """Edge case: image with zero tumor pixels (smooth denominators)."""
    torch = pytest.importorskip('torch')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.utils.loss import BalancedCELoss
    logits = rng.standard_normal((2, 8, 8, 2), dtype=np.float32)
    targets = np.zeros((2, 8, 8), np.int64)
    want = BalancedCELoss()(torch.from_numpy(logits).permute(0, 3, 1, 2),
                            torch.from_numpy(targets)).item()
    got = float(balanced_ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)
