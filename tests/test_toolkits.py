"""Toolkit tests: NIfTI reader, tolerant unpickler, end-to-end convert."""

import gzip
import pickle
import struct
import sys
import types
import zipfile
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'toolkits'))

from nifti import load_nifti  # noqa: E402
from convert_medical_segmentation import (  # noqa: E402
    TolerantUnpickler,
    convert_task,
    load_ground_truth_pkl,
    normalize_image,
)


def write_nifti1(path, data: np.ndarray, slope=1.0, inter=0.0,
                 gz=False) -> None:
    """Minimal NIfTI-1 writer for tests (little-endian, n+1 magic)."""
    hdr = bytearray(352)
    struct.pack_into('<i', hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into('<8h', hdr, 40, *dims)
    code = {np.dtype(np.int16): 4, np.dtype(np.float32): 16,
            np.dtype(np.uint8): 2}[data.dtype]
    struct.pack_into('<h', hdr, 70, code)
    struct.pack_into('<h', hdr, 72, data.dtype.itemsize * 8)  # bitpix
    struct.pack_into('<f', hdr, 108, 352.0)  # vox_offset
    struct.pack_into('<f', hdr, 112, slope)
    struct.pack_into('<f', hdr, 116, inter)
    hdr[344:348] = b'n+1\x00'
    payload = bytes(hdr) + data.tobytes(order='F')
    if gz:
        payload = gzip.compress(payload)
    Path(path).write_bytes(payload)


def test_nifti_roundtrip(tmp_path, rng):
    data = (rng.standard_normal((6, 5, 4)) * 100).astype(np.int16)
    write_nifti1(tmp_path / 'a.nii', data)
    got = load_nifti(tmp_path / 'a.nii')
    np.testing.assert_allclose(got, data.astype(np.float32))
    assert got.shape == (6, 5, 4)


def test_nifti_gz_and_scaling(tmp_path, rng):
    data = (rng.random((4, 4, 3)) * 50).astype(np.int16)
    write_nifti1(tmp_path / 'b.nii.gz', data, slope=2.0, inter=-10.0,
                 gz=True)
    got = load_nifti(tmp_path / 'b.nii.gz')
    np.testing.assert_allclose(got, data * 2.0 - 10.0)


def test_normalize_image_modes():
    ct = np.linspace(-1000, 1000, 64).reshape(8, 8).astype(np.float32)
    # windowed
    w = normalize_image(ct, window_center=0, window_width=400)
    assert w.dtype == np.uint8 and w.min() == 0 and w.max() == 255
    # percentile auto
    a = normalize_image(ct)
    assert a.dtype == np.uint8 and a.max() == 255
    # already [0, 1]
    u = normalize_image(np.full((4, 4), 0.5, np.float32))
    assert (u == 127).all()


def _make_gt_pkl(path, shape, rois):
    """Pickle an evalseg-like object from a synthetic module, then drop
    the module so loading must go through the tolerant unpickler."""
    mod = types.ModuleType('evalseg_fake_io')

    class SegmentArray:
        pass

    class SingleSegment:
        pass

    SegmentArray.__module__ = 'evalseg_fake_io'
    SegmentArray.__qualname__ = 'SegmentArray'
    SingleSegment.__module__ = 'evalseg_fake_io'
    SingleSegment.__qualname__ = 'SingleSegment'
    mod.SegmentArray = SegmentArray
    mod.SingleSegment = SingleSegment
    sys.modules['evalseg_fake_io'] = mod
    try:
        obj = SegmentArray()
        obj.shape = shape
        obj.segments = []
        for roi in rois:
            seg = SingleSegment()
            seg.roi = roi
            seg.data = np.ones(tuple(s.stop - s.start for s in roi),
                               np.uint8)
            obj.segments.append(seg)
        with open(path, 'wb') as f:
            pickle.dump(obj, f)
    finally:
        del sys.modules['evalseg_fake_io']


def test_tolerant_unpickler_without_module(tmp_path):
    roi = (slice(1, 3), slice(2, 5), slice(0, 2))
    _make_gt_pkl(tmp_path / 'g.pkl', (6, 6, 3), [roi])
    with pytest.raises(ModuleNotFoundError):
        with open(tmp_path / 'g.pkl', 'rb') as f:
            pickle.load(f)
    vol = load_ground_truth_pkl(tmp_path / 'g.pkl')
    assert vol.shape == (6, 6, 3)
    assert vol[roi].all() and vol.sum() == 2 * 3 * 2


def test_convert_task_end_to_end(tmp_path, rng):
    task = tmp_path / 'Task006_Lung'
    gt = task / 'GroundTruth'
    gt.mkdir(parents=True)
    shape = (16, 16, 5)
    ct = (rng.standard_normal(shape) * 300).astype(np.int16)
    nii = tmp_path / '7.nii'
    write_nifti1(nii, ct)
    with zipfile.ZipFile(task / 'CT.zip', 'w') as zf:
        zf.write(nii, '7.nii')
    # tumor on slices 1 and 3 only
    _make_gt_pkl(gt / '7.pkl', shape,
                 [(slice(4, 9), slice(4, 9), slice(1, 2)),
                  (slice(2, 12), slice(2, 12), slice(3, 4))])

    out = tmp_path / 'out'
    stats = convert_task(task, out, None, None, empty_ratio=1.0,
                         tumor_only=False, min_pixels=0, seed=0)
    assert stats['volumes'] == 1
    assert stats['slices_with_label'] == 2
    assert stats['saved_slices'] == 5  # 2 labeled + 3 empty (ratio 1.0)
    imgs = sorted((out / 'images').glob('*.png'))
    lbls = sorted((out / 'labels').glob('*.png'))
    assert [p.name for p in imgs] == [p.name for p in lbls]
    assert imgs[0].name.startswith('Task006_Lung_7_slice_')
    from PIL import Image
    lbl1 = np.asarray(Image.open(out / 'labels' /
                                 'Task006_Lung_7_slice_0001.png'))
    assert set(np.unique(lbl1)) <= {0, 255}
    assert (lbl1 > 0).sum() == 25

    # min_pixels filter drops the small 25-px tumor slice
    out2 = tmp_path / 'out2'
    stats2 = convert_task(task, out2, None, None, empty_ratio=0.0,
                          tumor_only=True, min_pixels=50, seed=0)
    assert stats2['slices_with_label'] == 1
    assert stats2['slices_filtered_small'] == 1
    assert stats2['saved_slices'] == 1
