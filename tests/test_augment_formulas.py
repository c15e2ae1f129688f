"""Closed-form checks of the augmentation math vs albumentations
semantics (reference unet/data/augmentations.py:56-89).

albumentations is not installed in this environment, so these tests pin
each transform against its *documented formula* instead of golden
outputs: exact per-sample shift/gain laws for brightness/contrast,
analytic field statistics for ElasticTransform, piecewise-linearity and
slope bounds for GridDistortion, rotation-invariant geometry for the
affine map, and rectangle-union structure for CoarseDropout. They
complement the geometry-consistency and statistical tests in
test_data.py (which check the pipeline's self-consistency, not its
formulas).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.data.augmentations import (
    AugmentConfig,
    _affine_matrices,
    _elastic_displacement,
    _gaussian_kernel1d,
    _grid_distortion_map,
    augment_batch,
)

OFF = dict(p_hflip=0.0, p_vflip=0.0, p_affine=0.0, p_elastic=0.0,
           p_grid=0.0, p_brightness=0.0, p_noise=0.0, p_dropout=0.0,
           mean=0.0, std=1.0)


def _cfg(**kw):
    return AugmentConfig(**{**OFF, **kw})


def _batch(rng, n=8, s=32, lo=0.3, hi=0.7):
    """Images away from [0,1] so clipping never bites formula checks."""
    imgs = rng.uniform(lo, hi, (n, s, s, 1)).astype(np.float32)
    masks = (rng.random((n, s, s)) > 0.8).astype(np.int32)
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_identity_config_is_bitwise_exact(rng):
    imgs, masks = _batch(rng)
    out_i, out_m = augment_batch(imgs, masks, jax.random.key(0), _cfg())
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(masks))


def test_brightness_is_exact_per_sample_shift(rng):
    """RandomBrightnessContrast with contrast off: out = in + beta,
    beta ~ U(-limit, limit) constant across the image (albumentations
    brightness_limit semantics)."""
    imgs, masks = _batch(rng)
    cfg = _cfg(p_brightness=1.0, brightness_limit=0.15, contrast_limit=0.0)
    out, _ = augment_batch(imgs, masks, jax.random.key(1), cfg)
    delta = np.asarray(out) - np.asarray(imgs)
    for i in range(delta.shape[0]):
        d = delta[i]
        assert d.max() - d.min() < 1e-6, 'shift must be constant per sample'
        assert abs(d.mean()) <= 0.15 + 1e-6
    # shifts vary across samples (not one shared draw)
    per_sample = delta.reshape(delta.shape[0], -1).mean(1)
    assert per_sample.std() > 1e-3


def test_contrast_is_exact_per_sample_gain(rng):
    """Brightness off: out = alpha * in, alpha = 1 + U(-limit, limit)."""
    imgs, masks = _batch(rng)
    cfg = _cfg(p_brightness=1.0, brightness_limit=0.0, contrast_limit=0.15)
    out, _ = augment_batch(imgs, masks, jax.random.key(2), cfg)
    ratio = np.asarray(out) / np.asarray(imgs)
    for i in range(ratio.shape[0]):
        r = ratio[i]
        assert r.max() - r.min() < 1e-4, 'gain must be constant per sample'
        assert 0.85 - 1e-6 <= r.mean() <= 1.15 + 1e-6


def test_gauss_noise_std_matches_drawn_range(rng):
    """GaussNoise with a pinned std range: per-sample residual std must
    equal it (formula: out = in + N(0, std^2))."""
    imgs, masks = _batch(rng, s=64)
    cfg = _cfg(p_noise=1.0, noise_std_min=0.02, noise_std_max=0.02)
    out, _ = augment_batch(imgs, masks, jax.random.key(3), cfg)
    resid = np.asarray(out) - np.asarray(imgs)
    for i in range(resid.shape[0]):
        # 64*64 samples => std estimate accurate to ~2%
        assert abs(resid[i].std() - 0.02) < 0.002


def test_affine_inverse_map_is_scaled_orthogonal(rng):
    """The inverse affine linear map must equal (R(a) S F)^-1: columns
    orthogonal, each of norm 1/scale, det = ±1/scale^2."""
    cfg = _cfg(p_affine=1.0, scale_min=0.9, scale_max=1.1,
               rotate_deg=15.0, translate_pct=0.1, p_hflip=0.5,
               p_vflip=0.3)
    lin, t = _affine_matrices(jax.random.key(4), cfg, 64, 32, 32)
    lin = np.asarray(lin)
    gram = np.einsum('nij,nik->njk', lin, lin)   # lin^T lin
    for g in gram:
        inv_s2 = g[0, 0]
        assert 1 / 1.1 ** 2 - 1e-5 <= inv_s2 <= 1 / 0.9 ** 2 + 1e-5
        np.testing.assert_allclose(g, np.eye(2) * inv_s2, atol=1e-5)
    # translations bounded by ±10% of each axis
    t = np.asarray(t)
    assert np.all(np.abs(t) <= 0.1 * 32 + 1e-5)


def test_affine_rotation_preserves_radius(rng):
    """Geometric invariant: with scale=1 and no translation, a bright
    dot keeps its distance from the image center under any sampled
    rotation/flip (the inverse-map convention cannot change radii)."""
    s = 65  # odd => exact center pixel
    imgs = np.zeros((8, s, s, 1), np.float32)
    r0, c0 = 12, 20  # radius^2 = (12-32)^2 + (20-32)^2
    imgs[:, r0, c0, 0] = 1.0
    masks = np.zeros((8, s, s), np.int32)
    cfg = _cfg(p_affine=1.0, scale_min=1.0, scale_max=1.0,
               rotate_deg=180.0, translate_pct=0.0, p_hflip=0.5,
               p_vflip=0.5)
    out, _ = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                           jax.random.key(5), cfg)
    out = np.asarray(out)
    center = (s - 1) / 2
    want_r = np.hypot(r0 - center, c0 - center)
    for i in range(out.shape[0]):
        total = out[i, :, :, 0].sum()
        assert total > 0.5, 'dot must survive (it stays inside the disc)'
        rr, cc = np.mgrid[0:s, 0:s]
        radius = np.hypot(rr - center, cc - center)
        mean_r = (out[i, :, :, 0] * radius).sum() / total
        # bilinear spreading moves mass < 1px off the true circle
        assert abs(mean_r - want_r) < 1.0, (i, mean_r, want_r)


def test_elastic_field_statistics_match_formula(rng):
    """ElasticTransform field = alpha * blur(U(-1,1), sigma). For a
    normalized gaussian kernel k the blurred-uniform std is
    sqrt(1/3) * ||k_2d||_2 = sqrt(1/3) * ||k_1d||_2^2, so the field std
    must be alpha times that (interior pixels; zero-padding attenuates
    the border)."""
    alpha, sigma = 50.0, 10.0
    cfg = _cfg(p_elastic=1.0, elastic_alpha=alpha, elastic_sigma=sigma)
    n, s = 4, 256
    dy, dx = _elastic_displacement(jax.random.key(6), cfg, n, s, s)
    radius = max(1, int(3.0 * sigma))
    k = np.asarray(_gaussian_kernel1d(sigma, radius))
    want_std = alpha * np.sqrt(1.0 / 3.0) * (np.sqrt((k ** 2).sum()) ** 2)
    interior = np.asarray(dy)[:, radius:-radius, radius:-radius]
    got = interior.std()
    assert abs(got - want_std) / want_std < 0.1, (got, want_std)
    # mean ~ 0 relative to the amplitude
    assert abs(interior.mean()) < 0.2 * want_std
    # smoothness: neighbouring displacement values are highly correlated
    a = interior[:, :, :-1].ravel()
    b = interior[:, :, 1:].ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.95


def test_grid_distortion_map_is_piecewise_linear_with_bounded_slopes():
    """GridDistortion: the per-axis map must be exactly piecewise linear
    over grid_steps cells, start at 0, and have per-cell slopes equal to
    the drawn (1 + U(-limit, limit)) factors."""
    cfg = _cfg(p_grid=1.0, grid_steps=5, grid_limit=0.2)
    n, size = 16, 100  # 5 cells x 20 px
    m = np.asarray(_grid_distortion_map(jax.random.key(7), cfg, n, size, 0))
    assert m.shape == (n, size)
    np.testing.assert_allclose(m[:, 0], 0.0, atol=1e-5)
    cell = size // 5
    slopes = np.diff(m, axis=1)
    for i in range(n):
        for c in range(5):
            lo, hi = c * cell, (c + 1) * cell - 1
            cs = slopes[i, lo:hi]
            # constant within the cell...
            assert cs.max() - cs.min() < 1e-4, (i, c)
            # ...and within the documented distortion bounds
            assert 0.8 - 1e-5 <= cs[0] <= 1.2 + 1e-5
    # identity when disabled
    cfg0 = _cfg(p_grid=0.0)
    m0 = np.asarray(_grid_distortion_map(jax.random.key(8), cfg0, 4,
                                         size, 0))
    np.testing.assert_allclose(
        m0, np.broadcast_to(np.arange(size, dtype=np.float32), (4, size)),
        atol=1e-4)


def test_coarse_dropout_zeroes_bounded_rectangles(rng):
    """CoarseDropout must zero a union of <= holes_max axis-aligned
    rectangles with side lengths inside the configured fractions."""
    imgs, masks = _batch(rng, n=32, s=64, lo=0.5, hi=0.9)
    cfg = _cfg(p_dropout=1.0, dropout_holes_max=4,
               hole_frac_min=0.05, hole_frac_max=0.10)
    out, out_m = augment_batch(imgs, masks, jax.random.key(9), cfg)
    out = np.asarray(out)
    zero = out[..., 0] == 0.0
    assert zero.any(), 'p=1 must produce holes'
    max_side = int(np.ceil(0.10 * 64)) + 1
    max_area = 4 * max_side * max_side
    for i in range(zero.shape[0]):
        z = zero[i]
        assert 0 < z.sum() <= max_area, (i, z.sum())
        # every zeroed row segment is a run of >= ~min-side length
        rows = np.where(z.any(axis=1))[0]
        assert len(rows) <= 4 * max_side
    # masks untouched (image-only transform)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(masks))
