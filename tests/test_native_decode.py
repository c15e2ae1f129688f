"""Native inference decode stage (csrc decode_resize_batch via
data/cache.py::native_decode_batch): PIL-bit-exact parity with the
predict CLI's preprocess_image for grayscale PNGs, plus the per-image
fallback markers (corrupt -> -1, color/16-bit -> -2) the CLI's PIL fallback
keys on. The reference decodes with PIL one image at a time inside the
predict loop (ref scripts/predict.py:100-135)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from unet_tpu.cli.predict import preprocess_image  # noqa: E402
from unet_tpu.data.cache import native_decode_batch  # noqa: E402


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


@pytest.fixture(scope='module')
def png_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('native_decode')
    rng = np.random.default_rng(11)
    # same-size, upscale, downscale, non-square, odd sizes
    shapes = [(64, 64), (40, 40), (100, 80), (37, 53), (128, 64)]
    paths = []
    for i, (h, w) in enumerate(shapes):
        p = tmp / f'gray_{i}.png'
        _write_png(p, (rng.random((h, w)) * 255).astype(np.uint8))
        paths.append(p)
    return tmp, paths


def test_native_matches_pil_preprocess(png_dir):
    """Pixels AND original sizes must equal preprocess_image exactly
    (the native resize reproduces Pillow's triangle-filter fixed-point
    resample bit-for-bit; same-size inputs take the memcpy path)."""
    tmp, paths = png_dir
    img_size = 64
    dec = native_decode_batch(paths, img_size, num_threads=2)
    assert dec is not None, 'native library should build in this env'
    out, meta = dec
    assert out.shape == (len(paths), img_size, img_size)
    for j, p in enumerate(paths):
        want, orig = preprocess_image(p, img_size)
        assert (int(meta[j, 0]), int(meta[j, 1])) == orig
        np.testing.assert_array_equal(out[j][..., None], want)


def test_native_flags_corrupt_color_and_16bit(png_dir):
    """Corrupt file -> meta [-1, 0]; RGB or 16-bit PNG -> meta [-2, 0]
    (PIL's convert('L') isn't reproduced for either: luma rounding for
    color, clip-at-255 vs high-byte chop for 16-bit; the CLI falls back
    to PIL). Good rows in the same batch still decode."""
    tmp, paths = png_dir
    rng = np.random.default_rng(12)
    corrupt = tmp / 'corrupt.png'
    corrupt.write_bytes(b'\x89PNG\r\n\x1a\nnot really a png')
    rgb = tmp / 'rgb.png'
    _write_png(rgb, (rng.random((32, 32, 3)) * 255).astype(np.uint8))
    g16 = tmp / 'gray16.png'
    _write_png(g16, (rng.random((32, 32)) * 65535).astype(np.uint16))
    batch = [corrupt, rgb, paths[0], g16]
    out, meta = native_decode_batch(batch, 64, num_threads=1)
    assert meta[0, 0] == -1
    assert meta[1, 0] == -2
    assert meta[3, 0] == -2
    want, orig = preprocess_image(paths[0], 64)
    assert (int(meta[2, 0]), int(meta[2, 1])) == orig
    np.testing.assert_array_equal(out[2][..., None], want)


def test_native_mem_matches_pil_preprocess(png_dir, tmp_path):
    """The in-memory variant (serving path, csrc decode_resize_mem via
    native_decode_mem) is PIL-bit-exact for grayscale PNG bytes and
    returns None for everything the PIL fallback must handle (non-PNG,
    corrupt, color, 16-bit)."""
    from unet_tpu.data.cache import native_decode_mem

    tmp, paths = png_dir
    for p in paths:
        dec = native_decode_mem(p.read_bytes(), 64)
        assert dec is not None, 'native library should build in this env'
        out, orig = dec
        want, want_orig = preprocess_image(p, 64)
        assert orig == want_orig
        np.testing.assert_array_equal(out[..., None], want)

    rng = np.random.default_rng(14)
    from PIL import Image
    import io
    buf = io.BytesIO()
    Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            buf, format='PNG')
    assert native_decode_mem(buf.getvalue(), 64) is None  # color
    buf = io.BytesIO()
    Image.fromarray(
        (rng.random((32, 32)) * 65535).astype(np.uint16)).save(
            buf, format='PNG')
    assert native_decode_mem(buf.getvalue(), 64) is None  # 16-bit
    assert native_decode_mem(b'\x89PNG\r\n\x1a\nnope', 64) is None
    assert native_decode_mem(b'not a png at all', 64) is None


def test_predict_cli_native_and_pil_paths_agree(png_dir, tmp_path):
    """The full predict CLI produces byte-identical masks with
    --no-native-decode and without it (mixed gray/rgb/corrupt source
    dir exercises the per-file fallback)."""
    import subprocess

    tmp, paths = png_dir
    src = tmp_path / 'src'
    src.mkdir()
    rng = np.random.default_rng(13)
    for i in range(3):
        _write_png(src / f'g_{i}.png',
                   (rng.random((40, 48)) * 255).astype(np.uint8))
    _write_png(src / 'rgb.png',
               (rng.random((40, 48, 3)) * 255).astype(np.uint8))
    _write_png(src / 'g16.png',
               (rng.random((40, 48)) * 65535).astype(np.uint16))
    (src / 'bad.png').write_bytes(b'nope')

    # tiny checkpoint via the training entry point used by other CLI
    # tests would be slow here; reuse the overfit-scale model by saving
    # a fresh init through the real CheckpointManager
    import jax
    import jax.numpy as jnp
    from unet_tpu.models import UNet
    from unet_tpu.train import create_optimizer, init_train_state
    from unet_tpu.train.callbacks import CheckpointManager

    model = UNet(base_features=4)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 32, 32, 1)),
                             create_optimizer(1e-3))
    cfg = {'model': {'type': 'unet', 'n_channels': 1, 'n_classes': 2,
                     'bilinear': True, 'base_features': 4,
                     'deep_supervision': False},
           'tpu': {'compute_dtype': 'float32'}}
    mgr = CheckpointManager(tmp_path / 'weights',
                            monitor='class_dice.tumor', mode='max')
    mgr.save(state, {'params': state.params,
                     'batch_stats': state.batch_stats},
             0, {'class_dice': {'tumor': 0.5}}, config=cfg)
    mgr.wait()
    mgr.close()

    def run(outdir, *extra):
        cmd = [sys.executable, str(REPO / 'scripts' / 'predict.py'),
               '--weights', str(tmp_path / 'weights' / 'last'),
               '--source', str(src), '--output', str(outdir),
               '--img-size', '32', '--batch-size', '4',
               '--device', 'cpu', *extra]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    out_nat = run(tmp_path / 'nat')
    out_pil = run(tmp_path / 'pil', '--no-native-decode')
    assert 'skip bad.png' in out_nat and 'skip bad.png' in out_pil
    masks_nat = sorted(p.name for p in (tmp_path / 'nat').glob('*.png'))
    masks_pil = sorted(p.name for p in (tmp_path / 'pil').glob('*.png'))
    assert masks_nat == masks_pil and len(masks_nat) == 5
    for name in masks_nat:
        a = (tmp_path / 'nat' / name).read_bytes()
        b = (tmp_path / 'pil' / name).read_bytes()
        assert a == b, f'{name} differs between native and PIL decode'


def _bomb_png_bytes():
    """A ~45-byte PNG whose IHDR declares 10^6 x 10^6 pixels — the
    classic decompression bomb. Valid signature + CRC so libpng gets as
    far as the IHDR before the pixel cap fires."""
    import struct
    import zlib
    sig = b'\x89PNG\r\n\x1a\n'
    ihdr = struct.pack('>IIBBBBB', 1_000_000, 1_000_000, 8, 0, 0, 0, 0)
    chunk = b'IHDR' + ihdr
    return (sig + struct.pack('>I', len(ihdr)) + chunk
            + struct.pack('>I', zlib.crc32(chunk)))


def test_native_rejects_decompression_bomb(png_dir, tmp_path):
    """A tiny PNG declaring huge dimensions must NOT allocate the pixel
    plane: the IHDR cap (csrc kMaxPixels, matching Pillow's
    DecompressionBombError threshold) converts it to the graceful
    meta=-1 / None fallback instead of a bad_alloc abort — this code
    runs on the serving request path behind ctypes."""
    from unet_tpu.data.cache import native_decode_mem

    bomb = tmp_path / 'bomb.png'
    bomb.write_bytes(_bomb_png_bytes())
    tmp, paths = png_dir
    out, meta = native_decode_batch([bomb, paths[0]], 64, num_threads=1)
    assert meta[0, 0] == -1  # rejected, caller falls back to PIL
    # the good row in the same batch still decodes
    want, orig = preprocess_image(paths[0], 64)
    assert (int(meta[1, 0]), int(meta[1, 1])) == orig
    np.testing.assert_array_equal(out[1][..., None], want)
    # in-memory (serving) variant: graceful None, no abort
    assert native_decode_mem(_bomb_png_bytes(), 64) is None
    # and the PIL fallback agrees it is unloadable (DecompressionBomb)
    from PIL import Image
    import io
    with pytest.raises(Exception):
        Image.open(io.BytesIO(_bomb_png_bytes())).convert('L')
