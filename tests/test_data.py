"""Data layer tests: volume-split parity with the reference, loader
semantics, and on-device augmentation behavior."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_tpu.data import (
    AugmentConfig,
    BatchLoader,
    SyntheticSliceDataset,
    augment_batch,
    normalize_batch,
    volume_split,
)

REF = Path('/root/reference')


def _fake_names(n_volumes=17, slices=3):
    return sorted(f'{v}_slice_{s:04d}.png' for v in range(n_volumes)
                  for s in range(slices))


def test_volume_split_disjoint_and_complete():
    names = _fake_names()
    splits = {s: volume_split(names, s, val_ratio=0.2, test_ratio=0.1,
                              seed=42) for s in ('train', 'val', 'test')}
    all_out = sum(splits.values(), [])
    assert sorted(all_out) == names
    vols = {s: {f.split('_slice_')[0] for f in fs}
            for s, fs in splits.items()}
    assert not (vols['train'] & vols['val'])
    assert not (vols['train'] & vols['test'])
    assert not (vols['val'] & vols['test'])


def test_volume_split_reproducible():
    names = _fake_names()
    a = volume_split(names, 'val', seed=42)
    b = volume_split(names, 'val', seed=42)
    c = volume_split(names, 'val', seed=7)
    assert a == b and a != c


@pytest.mark.skipif(not REF.exists(), reason='reference repo not mounted')
def test_volume_split_matches_reference(tmp_path):
    """Build a tiny real dataset dir and compare membership with the
    reference LungTumorDataset for every split."""
    pytest.importorskip('torch')
    from PIL import Image
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from unet.data.dataset import LungTumorDataset

    (tmp_path / 'images').mkdir()
    (tmp_path / 'labels').mkdir()
    names = _fake_names(n_volumes=11, slices=2)
    img = Image.fromarray(np.zeros((8, 8), np.uint8))
    for n in names:
        img.save(tmp_path / 'images' / n)
        img.save(tmp_path / 'labels' / n)

    for split in ('train', 'val', 'test', 'all'):
        ref_ds = LungTumorDataset(str(tmp_path), split=split, val_ratio=0.2,
                                  test_ratio=0.1, seed=42, img_size=8)
        ours = volume_split(names, split, val_ratio=0.2, test_ratio=0.1,
                            seed=42)
        assert sorted(ours) == sorted(ref_ds.files), split


def test_synthetic_dataset_and_loader():
    ds = SyntheticSliceDataset(num_volumes=5, slices_per_volume=2,
                               img_size=32)
    assert len(ds) > 0
    img, msk = ds.load(0)
    assert img.shape == (32, 32) and img.dtype == np.float32
    assert img.min() >= 0 and img.max() <= 1
    assert set(np.unique(msk)) <= {0, 1}
    # deterministic loads
    img2, _ = ds.load(0)
    np.testing.assert_array_equal(img, img2)

    loader = BatchLoader(ds, batch_size=3, shuffle=True, drop_last=True,
                         seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 3 == len(loader)
    im, mk = batches[0]
    assert im.shape == (3, 32, 32, 1) and mk.shape == (3, 32, 32)


def _identity_cfg():
    return AugmentConfig(p_hflip=0.0, p_vflip=0.0, p_affine=0.0,
                         p_elastic=0.0, p_grid=0.0, p_brightness=0.0,
                         p_noise=0.0, p_dropout=0.0)


def test_augment_identity_when_disabled(rng):
    images = rng.random((2, 32, 32, 1), dtype=np.float32)
    masks = (rng.random((2, 32, 32)) > 0.7).astype(np.int32)
    out_i, out_m = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                                 jax.random.key(0), _identity_cfg())
    np.testing.assert_allclose(np.asarray(out_i),
                               (images - 0.5) / 0.5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_m), masks)


def test_augment_hflip_exact(rng):
    """With p_hflip=1 and everything else off, output = mirrored input."""
    images = rng.random((2, 16, 16, 1), dtype=np.float32)
    masks = (rng.random((2, 16, 16)) > 0.7).astype(np.int32)
    cfg = _identity_cfg().replace(p_hflip=1.0)
    out_i, out_m = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                                 jax.random.key(1), cfg)
    np.testing.assert_allclose(np.asarray(out_i),
                               (images[:, :, ::-1] - 0.5) / 0.5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_m), masks[:, :, ::-1])


def test_augment_geometry_consistent_between_image_and_mask(rng):
    """Put the 'tumor' intensity exactly on mask pixels; after any
    geometric transform they must still coincide (approximately, modulo
    bilinear-vs-nearest edges)."""
    masks = np.zeros((4, 64, 64), np.int32)
    masks[:, 24:40, 24:40] = 1
    images = masks[..., None].astype(np.float32)
    cfg = AugmentConfig(p_affine=1.0, p_elastic=1.0, p_grid=1.0,
                        p_hflip=0.5, p_vflip=0.5, p_brightness=0.0,
                        p_noise=0.0, p_dropout=0.0)
    out_i, out_m = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                                 jax.random.key(2), cfg)
    img = np.asarray(out_i) * 0.5 + 0.5  # denormalize
    m = np.asarray(out_m)
    assert m.sum() > 50  # square survived
    # image>0.5 region should overlap mask region strongly
    pred = img[..., 0] > 0.5
    inter = (pred & (m == 1)).sum()
    union = (pred | (m == 1)).sum()
    assert inter / union > 0.85


def test_augment_changes_are_random_per_sample(rng):
    images = np.tile(rng.random((1, 32, 32, 1), dtype=np.float32), (4, 1, 1, 1))
    masks = np.zeros((4, 32, 32), np.int32)
    cfg = AugmentConfig()  # defaults
    out_i, _ = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                             jax.random.key(3), cfg)
    out = np.asarray(out_i)
    diffs = [np.abs(out[i] - out[j]).max() for i in range(4)
             for j in range(i + 1, 4)]
    assert max(diffs) > 1e-3  # identical inputs augmented differently


def test_augment_statistics(rng):
    """Empirical application rates roughly match configured probabilities
    (coarse statistical parity with albumentations)."""
    n = 200
    images = np.full((n, 16, 16, 1), 0.5, np.float32)
    masks = np.zeros((n, 16, 16), np.int32)
    cfg = _identity_cfg().replace(p_noise=0.3)
    out_i, _ = augment_batch(jnp.asarray(images), jnp.asarray(masks),
                             jax.random.key(4), cfg)
    out = np.asarray(out_i) * 0.5 + 0.5
    noisy = (np.abs(out - 0.5).max(axis=(1, 2, 3)) > 1e-6)
    rate = noisy.mean()
    assert 0.2 < rate < 0.4, rate


def test_coarse_dropout_hole_dims_independent(rng):
    """Hole height and width must be sampled from independent keys
    (albumentations semantics). With H == W, key reuse makes every hole
    exactly square — detect that by recovering each hole's bounding box
    from a white image."""
    from unet_tpu.data.augmentations import _coarse_dropout

    n, hw = 64, 96
    images = np.ones((n, hw, hw, 1), np.float32)
    cfg = AugmentConfig(p_dropout=1.0, dropout_holes_max=1,
                        hole_frac_min=0.10, hole_frac_max=0.40)
    out = np.asarray(_coarse_dropout(jax.random.key(7),
                                     jnp.asarray(images), cfg))
    heights, widths = [], []
    for i in range(n):
        zero_rows = np.where((out[i, :, :, 0] == 0).any(axis=1))[0]
        zero_cols = np.where((out[i, :, :, 0] == 0).any(axis=0))[0]
        assert zero_rows.size and zero_cols.size
        heights.append(zero_rows.size)
        widths.append(zero_cols.size)
    heights, widths = np.asarray(heights), np.asarray(widths)
    # key reuse => |h - w| <= 1 everywhere (rounding); independence =>
    # most samples differ by several pixels at these fractions
    assert (np.abs(heights - widths) > 1).mean() > 0.5


def test_normalize_batch():
    x = jnp.asarray([[0.0, 0.5, 1.0]])
    np.testing.assert_allclose(np.asarray(normalize_batch(x)),
                               [[-1.0, 0.0, 1.0]], atol=1e-6)


def test_slice_cache_native_and_python(tmp_path, rng):
    """Build the cache with the native C++ builder and the Python
    fallback; both must produce identical blobs and round-trip through
    CachedSliceDataset with the same split as SliceDataset."""
    from PIL import Image

    from unet_tpu.data.cache import build_cache, CachedSliceDataset
    from unet_tpu.data.dataset import SliceDataset

    (tmp_path / 'images').mkdir()
    (tmp_path / 'labels').mkdir()
    names = [f'{v}_slice_{s:04d}.png' for v in range(6) for s in range(2)]
    for n in names:
        img = (rng.random((24, 24)) * 255).astype(np.uint8)
        msk = ((rng.random((24, 24)) > 0.8) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / 'images' / n)
        Image.fromarray(msk).save(tmp_path / 'labels' / n)

    import json
    # same-size build: native and python blobs must be bitwise identical
    native = tmp_path / 'cache_native.bin'
    pyref = tmp_path / 'cache_python.bin'
    build_cache(tmp_path, native, img_size=24, prefer_native=True)
    build_cache(tmp_path, pyref, img_size=24, prefer_native=False)
    native_used = json.loads(open(str(native) + '.json').read())['native']
    if native_used:
        assert native.read_bytes() == pyref.read_bytes()

    # resized builds must ALSO be bitwise identical: the native builder
    # reproduces Pillow's exact resampling — the adaptive triangle
    # filter with 22-bit fixed-point accumulation for BILINEAR, and
    # ImagingScaleAffine's repeated-double-addition coordinate walk for
    # NEAREST (whose rounding drift flips picks at exact boundaries)
    if native_used:
        for sz in (16, 48):  # downscale and upscale of the 24px sources
            nat = tmp_path / f'c{sz}n.bin'
            py = tmp_path / f'c{sz}p.bin'
            build_cache(tmp_path, nat, img_size=sz, prefer_native=True)
            build_cache(tmp_path, py, img_size=sz, prefer_native=False)
            assert nat.read_bytes() == py.read_bytes(), sz
        a = CachedSliceDataset(tmp_path / 'c16n.bin', split='all')
        ra, ma = a.load_raw(0)
        assert set(np.unique(ma)) <= {0, 1}

    ds = CachedSliceDataset(pyref, split='val', val_ratio=0.25, seed=42)
    ref = SliceDataset(tmp_path, split='val', val_ratio=0.25, seed=42,
                       img_size=24)
    assert ds.files == ref.files
    img_a, msk_a = ds.load(0)
    img_b, msk_b = ref.load(0)
    np.testing.assert_array_equal(msk_a, msk_b)
    np.testing.assert_allclose(img_a, img_b, atol=1 / 255)
    raw_i, raw_m = ds.load_raw(0)
    assert raw_i.dtype == np.uint8 and set(np.unique(raw_m)) <= {0, 1}


def test_batchloader_bounded_in_flight():
    """The loader must not decode the whole epoch ahead of the consumer
    (unbounded submit-ahead held every decoded sample in memory: ~0.5 MB
    x dataset size at 512^2). At most max_in_flight batches (+1 being
    collected) may have been loaded before the consumer advances."""
    import time

    from unet_tpu.data import BatchLoader, SyntheticSliceDataset

    class Counting(SyntheticSliceDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.loads = 0

        def load_raw(self, idx):
            self.loads += 1
            return super().load_raw(idx)

    ds = Counting(num_volumes=30, slices_per_volume=4, img_size=8,
                  val_ratio=0.0)
    bs = 4
    loader = BatchLoader(ds, bs, raw_uint8=True, num_threads=4)
    it = iter(loader)
    next(it)
    time.sleep(0.5)  # give the thread pool time to run anything queued
    # submitted so far: max_in_flight initial batches + 1 refill
    cap = (loader.max_in_flight + 1) * bs
    assert ds.loads <= cap, (ds.loads, cap)
    list(it)  # drain
    # order and content are unchanged by the bounded pipeline;
    # num_threads=0 means synchronous loading (torch DataLoader
    # num_workers=0 semantics — a config of workers: 0 must not crash)
    plain = list(BatchLoader(ds, bs, raw_uint8=True, num_threads=1))
    got = list(BatchLoader(ds, bs, raw_uint8=True, num_threads=4))
    sync = list(BatchLoader(ds, bs, raw_uint8=True, num_threads=0))
    assert len(got) == len(plain) == len(sync)
    for (ia, ma), (ib, mb), (ic, mc) in zip(got, plain, sync):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ic, ib)
        np.testing.assert_array_equal(mc, mb)


def test_batchloader_raw_uint8(rng):
    from unet_tpu.data import BatchLoader, SyntheticSliceDataset
    ds = SyntheticSliceDataset(num_volumes=3, slices_per_volume=2,
                               img_size=16)
    im, mk = next(iter(BatchLoader(ds, 2, raw_uint8=True)))
    assert im.dtype == np.uint8 and mk.dtype == np.uint8
    imf, mkf = next(iter(BatchLoader(ds, 2)))
    np.testing.assert_allclose(im[..., 0] / 255.0, imf[..., 0], atol=1/255)
    np.testing.assert_array_equal(mk, mkf)


def test_grid_sample_fused_matches_pair(rng):
    """The one-gather warp (_grid_sample_fused) must be bit-identical to
    _grid_sample_bilinear + _grid_sample_nearest on every regime: in
    range, out of range (zero border), exact borders, and exact-half
    coordinates (round-half-even ties)."""
    import jax.numpy as jnp

    from unet_tpu.data.augmentations import (_grid_sample_bilinear,
                                             _grid_sample_fused,
                                             _grid_sample_nearest)

    n, h, w = 3, 24, 20
    images = jnp.asarray(rng.random((n, h, w, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((n, h, w)) > 0.6).astype(np.int32))

    cases = {
        'random_in_range': (
            rng.random((n, h, w)).astype(np.float32) * (h - 1),
            rng.random((n, h, w)).astype(np.float32) * (w - 1)),
        'out_of_range': (
            (rng.random((n, h, w)).astype(np.float32) * (h + 8) - 4),
            (rng.random((n, h, w)).astype(np.float32) * (w + 8) - 4)),
        # exact integers and exact halves (both parities) hit the
        # round-half-even tie rule and the border clamps
        'halves_and_borders': (
            np.asarray(rng.integers(0, 2 * h - 1, (n, h, w)),
                       np.float32) / 2.0,
            np.asarray(rng.integers(0, 2 * w - 1, (n, h, w)),
                       np.float32) / 2.0),
    }
    for name, (rows, cols) in cases.items():
        rows, cols = jnp.asarray(rows), jnp.asarray(cols)
        ref_i = _grid_sample_bilinear(images, rows, cols)
        ref_m = _grid_sample_nearest(masks, rows, cols)
        got_i, got_m = _grid_sample_fused(images, masks, rows, cols)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m),
                                      err_msg=name)


def test_synthetic_dataset_cross_process_reproducible():
    """The synthetic generator must produce byte-identical content for a
    given seed in EVERY interpreter: the cross-framework parity corpus
    (scripts/export_synthetic.py, docs/parity_r3) depends on it. The
    original implementation seeded with Python's salted hash() and
    silently violated this — the pinned CRCs below fail under any
    per-process seeding."""
    import zlib

    from unet_tpu.data.dataset import SyntheticSliceDataset

    ds = SyntheticSliceDataset(num_volumes=2, slices_per_volume=2,
                               img_size=64, split='all', seed=42)
    img, msk = ds.load(0)
    assert zlib.crc32(np.ascontiguousarray(img).tobytes()) == 2578097029
    assert zlib.crc32(np.ascontiguousarray(msk).tobytes()) == 2760879642


def test_augment_config_from_yaml_keys():
    """Reference keys AND the r3 extension keys (used by the
    parity-control config to express the reference's hflip-only
    fallback transform set) map onto AugmentConfig fields; absent keys
    keep the reference pipeline's hardcoded defaults."""
    from unet_tpu.data.augmentations import AugmentConfig

    cfg = AugmentConfig.from_yaml({
        'horizontal_flip': 0.9, 'rotation_limit': 7, 'elastic': 0.0,
        'brightness_contrast': 0.0, 'vertical_flip': 0.0, 'affine': 0.0,
        'grid_distortion': 0.0, 'gauss_noise': 0.0, 'coarse_dropout': 0.0,
    })
    assert cfg.p_hflip == 0.9 and cfg.rotate_deg == 7.0
    assert (cfg.p_elastic, cfg.p_brightness, cfg.p_vflip, cfg.p_affine,
            cfg.p_grid, cfg.p_noise, cfg.p_dropout) == (0,) * 7

    default = AugmentConfig.from_yaml(None)
    ref = AugmentConfig()
    assert default == ref  # absent section == reference pipeline defaults
