"""Host-side dataset: PNG slice index, volume-based split, batch loader.

Mirrors the reference LungTumorDataset contract (unet/data/dataset.py:20-191):

* Directory layout ``root/{images,labels}/*.png`` with filenames
  ``{volume}_slice_{idx}.png``.
* **Volume-based split** to prevent slice leakage: volume ids are the
  filename prefix before ``_slice_`` (dataset.py:97), sorted numerically
  when possible, shuffled with Python's Mersenne-Twister
  (``random.seed(seed)``-equivalent, dataset.py:101-103) and cut with
  ``n_test = int(n*test_ratio)``, ``n_val = int(n*val_ratio)``
  (dataset.py:106-109) — reproduced exactly so train/val membership
  matches the reference for Dice parity (SURVEY.md §7 hard parts).
* ``load(idx)`` returns image float32 (H, W) in [0, 1] and mask int32
  {0, 1} (>127 binarization, dataset.py:150), resized on host to
  img_size (PIL bilinear / NEAREST like ref augmentations.py:148-153).

TPU-side differences from the reference: instead of per-sample transforms
in DataLoader worker processes, batches are assembled with a thread pool
and normalized/augmented on device (unet_tpu.data.augmentations); the
loader below also provides double-buffered device prefetch.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

CLASS_NAMES = ['background', 'tumor']


def volume_split(all_files: List[str], split: str, val_ratio: float = 0.2,
                 test_ratio: float = 0.0, seed: int = 42) -> List[str]:
    """Reference-exact volume split (ref dataset.py:90-128)."""
    volume_ids = list({f.split('_slice_')[0] for f in all_files})
    volume_ids.sort(key=lambda x: int(x) if x.isdigit() else x)
    rng = random.Random(seed)
    shuffled = volume_ids.copy()
    rng.shuffle(shuffled)
    n = len(shuffled)
    n_test = int(n * test_ratio)
    n_val = int(n * val_ratio)
    n_train = n - n_test - n_val
    groups = {
        'train': set(shuffled[:n_train]),
        'val': set(shuffled[n_train:n_train + n_val]),
        'test': set(shuffled[n_train + n_val:]),
    }
    split = split.lower()
    if split == 'all':
        return list(all_files)
    if split not in groups:
        raise ValueError(f"Invalid split: {split}. "
                         "Use 'train', 'val', 'test', or 'all'")
    target = groups[split]
    return [f for f in all_files if f.split('_slice_')[0] in target]


class SliceDataset:
    """PNG slice dataset with reference-compatible split semantics."""

    def __init__(self, root: str, split: str = 'train',
                 val_ratio: float = 0.2, test_ratio: float = 0.0,
                 seed: int = 42, img_size: int = 512):
        if not _HAS_PIL:
            raise ImportError('Pillow is required for SliceDataset')
        self.root = Path(root)
        self.split = split.lower()
        self.img_size = img_size
        self.images_dir = self.root / 'images'
        self.labels_dir = self.root / 'labels'
        if not self.images_dir.exists():
            raise FileNotFoundError(
                f'Images directory not found: {self.images_dir}')
        if not self.labels_dir.exists():
            raise FileNotFoundError(
                f'Labels directory not found: {self.labels_dir}')
        all_files = sorted(f.name for f in self.images_dir.glob('*.png'))
        if not all_files:
            raise ValueError(f'No PNG files found in {self.images_dir}')
        self.files = volume_split(all_files, self.split, val_ratio,
                                  test_ratio, seed)
        print(f'SliceDataset [{split}]: {len(self.files)} samples')

    def __len__(self) -> int:
        return len(self.files)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        name = self.files[idx]
        img = Image.open(self.images_dir / name).convert('L')
        msk = Image.open(self.labels_dir / name).convert('L')
        if img.size != (self.img_size, self.img_size):
            img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
        if msk.size != (self.img_size, self.img_size):
            msk = msk.resize((self.img_size, self.img_size), Image.NEAREST)
        image = np.asarray(img, np.float32) / 255.0
        mask = (np.asarray(msk, np.uint8) > 127).astype(np.int32)
        return image, mask

    def load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 variant of ``load`` for cheap host->device transfer:
        image uint8 [0,255], mask uint8 {0,1}. Convert on device with
        ``images.astype(f32)/255``."""
        name = self.files[idx]
        img = Image.open(self.images_dir / name).convert('L')
        msk = Image.open(self.labels_dir / name).convert('L')
        if img.size != (self.img_size, self.img_size):
            img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
        if msk.size != (self.img_size, self.img_size):
            msk = msk.resize((self.img_size, self.img_size), Image.NEAREST)
        return (np.asarray(img, np.uint8),
                (np.asarray(msk, np.uint8) > 127).astype(np.uint8))

    def get_sample_info(self, idx: int) -> Dict:
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


class SyntheticSliceDataset:
    """Synthetic CT-like slices with blob 'tumors' — lets tests, the
    overfit harness, and benchmarks run without the 40 GB Kaggle set
    (SURVEY.md §4 recommendation)."""

    def __init__(self, num_volumes: int = 10, slices_per_volume: int = 8,
                 img_size: int = 512, split: str = 'train',
                 val_ratio: float = 0.2, test_ratio: float = 0.0,
                 seed: int = 42, tumor_prob: float = 0.9,
                 tumor_radius: Tuple[float, float] = (0.02, 0.05)):
        self.img_size = img_size
        self.seed = seed
        self.tumor_prob = tumor_prob
        self.tumor_radius = tumor_radius
        names = [f'{v}_slice_{s:04d}.png' for v in range(num_volumes)
                 for s in range(slices_per_volume)]
        self.files = volume_split(names, split, val_ratio, test_ratio, seed)
        # slices are deterministic per (seed, name): memoize the uint8
        # form (~0.5MB per 512^2 slice) — regeneration every epoch made
        # long synthetic runs host-bound (measured 10-15 slices/s end to
        # end vs 64 on-device)
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def __len__(self) -> int:
        return len(self.files)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        name = self.files[idx]
        # crc32, NOT hash(): Python's hash is salted per interpreter
        # (PYTHONHASHSEED), which silently broke the "same seed =>
        # byte-identical corpus" contract scripts/export_synthetic.py
        # and the cross-framework control (docs/parity_r3) rely on
        import zlib
        rng = np.random.default_rng(
            zlib.crc32(f'{self.seed}:{name}'.encode()))
        s = self.img_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        # lung-ish background: two soft ellipses + noise
        img = 0.15 + 0.05 * rng.standard_normal((s, s)).astype(np.float32)
        for cx in (0.32, 0.68):
            d = (((xx / s - cx) / 0.18) ** 2 + ((yy / s - 0.5) / 0.3) ** 2)
            img += 0.35 * np.exp(-d * 3.0)
        mask = np.zeros((s, s), np.int32)
        if rng.random() < self.tumor_prob:
            n_blobs = rng.integers(1, 3)
            for _ in range(n_blobs):
                cx, cy = rng.uniform(0.25, 0.75, 2)
                rad = rng.uniform(*self.tumor_radius) * s
                d2 = (xx - cx * s) ** 2 + (yy - cy * s) ** 2
                blob = d2 < rad ** 2
                mask[blob] = 1
                img[blob] += rng.uniform(0.3, 0.5)
        img = np.clip(img, 0.0, 1.0)
        return img.astype(np.float32), mask

    def load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._cache.get(idx)
        if cached is None:
            img, mask = self.load(idx)
            cached = ((img * 255).astype(np.uint8), mask.astype(np.uint8))
            self._cache[idx] = cached
        return cached

    def get_sample_info(self, idx: int) -> Dict:
        name = self.files[idx]
        parts = name.replace('.png', '').split('_slice_')
        return {'filename': name, 'volume_id': parts[0],
                'slice_id': int(parts[1])}

    @property
    def class_names(self) -> List[str]:
        return list(CLASS_NAMES)

    @property
    def num_classes(self) -> int:
        return 2


class BatchLoader:
    """Threaded batch assembler (the TPU replacement for torch DataLoader
    worker processes, ref train.py:272-287).

    Yields (images (B, H, W, 1) float32 in [0,1], masks (B, H, W) int32)
    numpy batches. Train: shuffled each epoch, drop_last. Val: ordered,
    keeps the tail batch (smaller — callers jit-compile at most two batch
    shapes, matching torch semantics where the tail batch is smaller).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_threads: int = 8, raw_uint8: bool = False,
                 local_slice: Optional[Tuple[int, int]] = None,
                 pad_tail: bool = False):
        """``batch_size`` is always the *global* batch. With
        ``local_slice=(index, count)`` (multi-host input sharding,
        SURVEY.md §5) every process computes the same global sample
        order (same seed) but loads/yields only its contiguous
        ``batch_size/count`` rows of each batch — the rows its
        addressable devices own under the batch sharding, so
        ``make_array_from_process_local_data`` reassembles exactly the
        single-process global batch. ``pad_tail`` repeats the final
        sample so the tail batch keeps the full batch shape (callers
        mask the pad rows; one jitted shape instead of two)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # torch-DataLoader semantics: num_workers=0 = load synchronously
        # in the consumer process; one pool thread is the equivalent here
        self.num_threads = max(1, num_threads)
        self.raw_uint8 = raw_uint8
        self.pad_tail = pad_tail
        if local_slice is not None:
            index, count = local_slice
            if batch_size % count != 0:
                raise ValueError(f'global batch {batch_size} not divisible '
                                 f'by process count {count}')
            if not (drop_last or pad_tail):
                raise ValueError('local_slice needs drop_last or pad_tail '
                                 '(uneven tail batches cannot be sharded)')
        self.local_slice = local_slice
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def tail_valid(self, batch_index: int) -> int:
        """Number of real (non-pad) rows in the given global batch."""
        return min(self.batch_size,
                   len(self.dataset) - batch_index * self.batch_size)

    # batches of decoded samples allowed in flight ahead of the consumer
    # (submitting the whole epoch up front — the old design — accumulated
    # every decoded sample in completed futures: ~0.5 MB x dataset size
    # at 512^2 uint8, gigabytes on a real corpus). 3 batches keep the
    # thread pool busy across the consumer's device dispatch while
    # bounding resident decoded data to ~3 batches.
    max_in_flight = 3

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        load = (self.dataset.load_raw if self.raw_uint8
                else self.dataset.load)

        def batch_indices(b: int) -> np.ndarray:
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            if self.pad_tail and len(idxs) < self.batch_size:
                idxs = np.concatenate([
                    idxs, np.repeat(idxs[-1:], self.batch_size - len(idxs))])
            if self.local_slice is not None:
                index, count = self.local_slice
                lb = self.batch_size // count
                idxs = idxs[index * lb:(index + 1) * lb]
            return idxs

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            # bounded pipeline: at most max_in_flight batches of load
            # futures exist at a time; the next batch is submitted as
            # soon as the current one is collected (before the yield, so
            # decode overlaps the consumer's work on the yielded batch)
            from collections import deque
            pending = deque(
                [pool.submit(load, int(i)) for i in batch_indices(b)]
                for b in range(min(self.max_in_flight, nb)))
            next_b = len(pending)
            while pending:
                batch_futs = pending.popleft()
                samples = [f.result() for f in batch_futs]
                if next_b < nb:
                    pending.append([pool.submit(load, int(i))
                                    for i in batch_indices(next_b)])
                    next_b += 1
                images = np.stack([s[0] for s in samples])[..., None]
                masks = np.stack([s[1] for s in samples])
                yield images, masks


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Double-buffered host->HBM prefetch: device_put the next batch(es)
    while the current one computes (SURVEY.md §5 input-pipeline plan)."""
    import jax
    import collections
    buf = collections.deque()

    multiproc = jax.process_count() > 1

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if multiproc:
            # each process holds only its local rows; assemble the
            # global batch (see core.mesh.shard_batch)
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def create_dataloaders(root: str, batch_size: int = 8,
                       val_ratio: float = 0.2, img_size: int = 256,
                       num_workers: int = 8, seed: int = 42,
                       synthetic: bool = False):
    """Convenience factory for (train_loader, val_loader) — the
    counterpart of ref unet/data/dataset.py:194-258. Train: shuffled,
    drop_last; val: ordered. Augmentation/normalization happen on device
    (unet_tpu.data.augmentations), not in the loader."""
    kwargs = dict(split='train', val_ratio=val_ratio, seed=seed,
                  img_size=img_size)
    if synthetic:
        train_ds = SyntheticSliceDataset(**kwargs)
        val_ds = SyntheticSliceDataset(**{**kwargs, 'split': 'val'})
    else:
        train_ds = SliceDataset(root, **kwargs)
        val_ds = SliceDataset(root, **{**kwargs, 'split': 'val'})
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True,
                               drop_last=True, seed=seed,
                               num_threads=num_workers)
    val_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                             num_threads=num_workers)
    return train_loader, val_loader
