"""Minimal pure-numpy NIfTI-1 reader.

The Kaggle medical-segmentation CT volumes are standard NIfTI-1 files.
nibabel is not always available, so this module parses the 348-byte
NIfTI-1 header directly (spec: https://nifti.nimh.nih.gov/nifti-1) and
returns the scaled image array like ``nibabel.get_fdata()`` would
(applying scl_slope/scl_inter). Supports .nii and .nii.gz, uncompressed
single-file images (magic ``n+1``).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import BinaryIO, Union

import numpy as np

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
    1024: np.int64, 1280: np.uint64,
}


def _read_all(f: BinaryIO) -> bytes:
    return f.read()


def load_nifti(path_or_bytes: Union[str, Path, bytes]) -> np.ndarray:
    """Read a NIfTI-1 volume and return float32 data with scaling
    applied, Fortran-ordered dims like nibabel (X, Y, Z[, T])."""
    if isinstance(path_or_bytes, (str, Path)):
        raw = Path(path_or_bytes).read_bytes()
    else:
        raw = path_or_bytes
    if raw[:2] == b'\x1f\x8b':  # gzip magic
        raw = gzip.decompress(raw)

    if len(raw) < 352:
        raise ValueError('not a NIfTI-1 file (too short)')
    sizeof_hdr = struct.unpack('<i', raw[0:4])[0]
    endian = '<'
    if sizeof_hdr != 348:
        sizeof_hdr = struct.unpack('>i', raw[0:4])[0]
        if sizeof_hdr != 348:
            raise ValueError('not a NIfTI-1 file (bad sizeof_hdr)')
        endian = '>'
    magic = raw[344:348]
    if not magic.startswith(b'n+1') and not magic.startswith(b'ni1'):
        raise ValueError(f'unsupported NIfTI magic: {magic!r}')

    dim = struct.unpack(f'{endian}8h', raw[40:56])
    ndim = dim[0]
    shape = tuple(int(d) for d in dim[1:1 + ndim])
    datatype = struct.unpack(f'{endian}h', raw[70:72])[0]
    if datatype not in _DTYPES:
        raise ValueError(f'unsupported NIfTI datatype code {datatype}')
    vox_offset = int(struct.unpack(f'{endian}f', raw[108:112])[0])
    scl_slope = struct.unpack(f'{endian}f', raw[112:116])[0]
    scl_inter = struct.unpack(f'{endian}f', raw[116:120])[0]

    dt = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=dt, count=count,
                         offset=vox_offset or 352)
    data = data.reshape(shape, order='F').astype(np.float32)
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data * slope + scl_inter
    return data
