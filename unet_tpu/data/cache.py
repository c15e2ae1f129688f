"""Memory-mapped slice cache: pay PNG decode once, stream epochs at
disk/page-cache speed.

The reference decodes PNGs per sample per epoch inside DataLoader
workers (ref unet/data/dataset.py:146-150). On a TPU host that wastes
the accelerator; here `build_cache` decodes+resizes every slice once
into one uint8 blob (native multithreaded C++/libpng builder in
`csrc/slice_cache.cpp` when available, pure-PIL fallback otherwise),
and `CachedSliceDataset` memory-maps it so `load_raw` is a zero-copy
view. Blob layout::

    'USC1' | int32 n | int32 img_size | n*S*S image bytes | n*S*S masks

with a `<cache>.json` sidecar listing slice filenames (volume-split
metadata).
"""

from __future__ import annotations

import ctypes
import json
import struct
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from unet_tpu.data.dataset import CLASS_NAMES, volume_split

_MAGIC = b'USC1'
_CSRC = Path(__file__).resolve().parent.parent.parent / 'csrc'


_LIB_CACHE: List[Optional[ctypes.CDLL]] = []


def _native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native cache builder. The handle is
    memoized: the predict CLI calls this per decoded chunk."""
    if _LIB_CACHE:
        return _LIB_CACHE[0]
    so = _CSRC / 'libslicecache.so'
    if not so.exists():
        try:
            subprocess.run(['make', '-C', str(_CSRC)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _LIB_CACHE.append(None)
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        lib = None
    if lib is not None and not hasattr(lib, 'decode_resize_mem'):
        # stale pre-r4 .so on disk: rebuild once and reload
        try:
            subprocess.run(['make', '-B', '-C', str(_CSRC)], check=True,
                           capture_output=True)
            lib = ctypes.CDLL(str(so))
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            lib = None
    if lib is not None:
        lib.build_slice_cache.restype = ctypes.c_int
        lib.build_slice_cache.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.slice_cache_last_error.restype = ctypes.c_char_p
        lib.decode_resize_batch.restype = ctypes.c_int
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.decode_resize_mem.restype = ctypes.c_int
        lib.decode_resize_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    _LIB_CACHE.append(lib)
    return lib


def _build_native(image_paths: List[str], label_paths: List[str],
                  img_size: int, out_path: str,
                  num_threads: int = 0) -> bool:
    lib = _native_lib()
    if lib is None:
        return False
    n = len(image_paths)
    ArrT = ctypes.c_char_p * n
    imgs = ArrT(*[p.encode() for p in image_paths])
    lbls = ArrT(*[p.encode() for p in label_paths])
    rc = lib.build_slice_cache(imgs, lbls, n, img_size, out_path.encode(),
                               num_threads)
    if rc != 0:
        raise RuntimeError('native cache build failed: '
                           f'{lib.slice_cache_last_error().decode()}')
    return True


def native_decode_batch(paths, img_size: int, num_threads: int = 0
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded native PNG decode + PIL-bit-exact bilinear resize for the
    predict CLI's decode stage (csrc decode_resize_batch). Returns
    ``(images (n, S, S) uint8, meta (n, 2) int32)`` where meta rows are
    ``[orig_w, orig_h]`` on success, ``[-1, 0]`` for a decode failure and
    ``[-2, 0]`` for a color or 16-bit input (both: caller falls back to
    PIL — libpng's color->luma rounding and 16-bit high-byte chop aren't
    Pillow-bit-exact). Returns None
    when the native library is unavailable; rows flagged negative carry
    undefined pixels."""
    lib = _native_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, img_size, img_size), np.uint8)
    meta = np.empty((n, 2), np.int32)
    ArrT = ctypes.c_char_p * n
    lib.decode_resize_batch(
        ArrT(*[str(p).encode() for p in paths]), n, img_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    return out, meta


_PNG_MAGIC = b'\x89PNG\r\n\x1a\n'


def native_decode_mem(data: bytes, img_size: int
                      ) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    """Native in-memory PNG decode + PIL-bit-exact bilinear resize for
    the serving path (csrc decode_resize_mem; one HTTP request body per
    call). Returns ``(image (S, S) uint8, (orig_w, orig_h))``, or None
    when the caller should use PIL instead: library unavailable, not a
    PNG, corrupt, or a color/16-bit input whose PIL 8-bit reduction
    libpng doesn't reproduce bit-exactly (same contract as
    ``native_decode_batch``; the PIL path raises the user-facing error
    for corrupt bodies)."""
    if not data.startswith(_PNG_MAGIC):
        return None
    lib = _native_lib()
    if lib is None:
        return None
    out = np.empty((img_size, img_size), np.uint8)
    meta = np.empty(2, np.int32)
    ok = lib.decode_resize_mem(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
        len(data), img_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if not ok:
        return None
    return out, (int(meta[0]), int(meta[1]))


def _build_python(image_paths: List[str], label_paths: List[str],
                  img_size: int, out_path: str) -> None:
    from PIL import Image
    n = len(image_paths)
    plane = img_size * img_size
    with open(out_path, 'wb') as f:
        f.write(_MAGIC)
        f.write(struct.pack('<ii', n, img_size))
        for paths, mode in ((image_paths, 'img'), (label_paths, 'msk')):
            for p in paths:
                im = Image.open(p).convert('L')
                if im.size != (img_size, img_size):
                    im = im.resize((img_size, img_size),
                                   Image.BILINEAR if mode == 'img'
                                   else Image.NEAREST)
                a = np.asarray(im, np.uint8)
                if mode == 'msk':
                    a = (a > 127).astype(np.uint8)
                assert a.size == plane
                f.write(a.tobytes())


def build_cache(dataset_root: str, out_path: str, img_size: int = 512,
                prefer_native: bool = True, num_threads: int = 0) -> str:
    """Build the cache blob for ``root/{images,labels}/*.png``."""
    root = Path(dataset_root)
    names = sorted(p.name for p in (root / 'images').glob('*.png'))
    if not names:
        raise ValueError(f'no PNGs under {root}/images')
    image_paths = [str(root / 'images' / n) for n in names]
    label_paths = [str(root / 'labels' / n) for n in names]
    out_path = str(out_path)
    built_native = False
    if prefer_native:
        try:
            built_native = _build_native(image_paths, label_paths, img_size,
                                         out_path, num_threads)
        except RuntimeError:
            raise
    if not built_native:
        _build_python(image_paths, label_paths, img_size, out_path)
    Path(out_path + '.json').write_text(json.dumps(
        {'files': names, 'img_size': img_size,
         'native': built_native}))
    return out_path


class CachedSliceDataset:
    """Zero-decode dataset over a cache blob; same interface and split
    semantics as SliceDataset."""

    def __init__(self, cache_path: str, split: str = 'train',
                 val_ratio: float = 0.2, test_ratio: float = 0.0,
                 seed: int = 42):
        cache_path = str(cache_path)
        meta = json.loads(Path(cache_path + '.json').read_text())
        all_files: List[str] = meta['files']
        with open(cache_path, 'rb') as f:
            magic = f.read(4)
            if magic != _MAGIC:
                raise ValueError(f'bad cache magic {magic!r}')
            n, img_size = struct.unpack('<ii', f.read(8))
        if n != len(all_files):
            raise ValueError('cache/sidecar length mismatch')
        self.img_size = img_size
        plane = img_size * img_size
        self._images = np.memmap(cache_path, np.uint8, 'r', offset=12,
                                 shape=(n, img_size, img_size))
        self._masks = np.memmap(cache_path, np.uint8, 'r',
                                offset=12 + n * plane,
                                shape=(n, img_size, img_size))
        self.files = volume_split(all_files, split, val_ratio, test_ratio,
                                  seed)
        self._index = {name: i for i, name in enumerate(all_files)}
        print(f'CachedSliceDataset [{split}]: {len(self.files)} samples '
              f'(of {n} cached @ {img_size})')

    def __len__(self) -> int:
        return len(self.files)

    def load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        i = self._index[self.files[idx]]
        return self._images[i], self._masks[i]

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        img, msk = self.load_raw(idx)
        return (np.asarray(img, np.float32) / 255.0,
                np.asarray(msk, np.int32))

    def get_sample_info(self, idx: int):
        name = self.files[idx]
        parts = name.replace('.png', '').split('_slice_')
        return {'filename': name, 'volume_id': parts[0],
                'slice_id': int(parts[1]) if len(parts) > 1 else 0}

    @property
    def class_names(self) -> List[str]:
        return list(CLASS_NAMES)

    @property
    def num_classes(self) -> int:
        return 2
