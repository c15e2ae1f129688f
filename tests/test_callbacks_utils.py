"""Callbacks, checkpointing, config and plotting utilities."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from unet_tpu.train.callbacks import CheckpointManager, EarlyStopping
from unet_tpu.utils.config import (
    get_nested_metric,
    increment_path,
    load_config,
    validate_config,
)


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=3, mode='max')
    assert not es(0.5)
    assert not es(0.6)
    assert not es(0.55)       # 1 bad
    assert not es(0.55)       # 2 bad
    assert es(0.55)           # 3 bad -> stop
    assert es.stopped
    es.reset()
    assert not es.stopped and es.counter == 0


def test_early_stopping_min_mode_min_delta():
    es = EarlyStopping(patience=2, mode='min', min_delta=0.1)
    assert not es(1.0)
    assert not es(0.95)  # not better by min_delta -> bad 1
    assert es(0.95)      # bad 2 -> stop


def test_early_stopping_invalid_mode():
    with pytest.raises(ValueError):
        EarlyStopping(mode='up')


def test_nested_metric():
    r = {'mean_dice': 0.7, 'class_dice': {'tumor': 0.81}}
    assert get_nested_metric(r, 'class_dice.tumor') == 0.81
    assert get_nested_metric(r, 'mean_dice') == 0.7
    assert get_nested_metric(r, 'missing.key') == 0.0


def test_increment_path(tmp_path):
    p = tmp_path / 'exp'
    assert increment_path(p) == p
    p.mkdir()
    assert increment_path(p) == tmp_path / 'exp2'
    (tmp_path / 'exp2').mkdir()
    assert increment_path(p) == tmp_path / 'exp3'


def test_load_config_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(tmp_path / 'nope.yaml')


def test_load_and_validate_shipped_config():
    cfg = load_config('configs/lung_tumor.yaml')
    validate_config(cfg)
    assert cfg['model']['type'] == 'attention_unet'
    assert cfg['data']['img_size'] == 512
    assert cfg['loss']['type'] == 'dice_bce'
    assert cfg['early_stopping']['monitor'] == 'class_dice.tumor'


def test_validate_config_rejects_bad():
    with pytest.raises(ValueError):
        validate_config({'model': {'type': 'resnet'}})
    with pytest.raises(ValueError):
        validate_config({'model': {'type': 'unet'},
                         'data': {'img_size': 8}})
    # non-multiples of 16 are VALID (the decoder pads the upsampled map
    # to the skip, ref layers.py:98-102; end-to-end in test_odd_sizes.py)
    validate_config({'model': {'type': 'unet'},
                     'data': {'img_size': 100}})


def test_checkpoint_manager_roundtrip(tmp_path):
    state = {'params': {'w': jnp.arange(4.0)}, 'step': jnp.int32(3)}
    model_vars = {'params': {'w': jnp.arange(4.0)},
                  'batch_stats': {'m': jnp.zeros(2)}}
    mgr = CheckpointManager(tmp_path / 'weights',
                            monitor='class_dice.tumor', mode='max')
    m1 = {'class_dice': {'tumor': 0.5}, 'mean_dice': 0.6}
    assert mgr.save(state, model_vars, 0, m1, config={'model': {'type': 'unet'}})
    m2 = {'class_dice': {'tumor': 0.4}}
    assert not mgr.save(state, model_vars, 1, m2)  # worse -> no best update
    assert mgr.best_epoch == 0
    # meta.json publishes only after the tensor saves are durable
    mgr.wait()

    meta = CheckpointManager.read_meta(tmp_path / 'weights' / 'best')
    assert meta['epoch'] == 0
    assert meta['monitor_value'] == 0.5
    assert meta['config']['model']['type'] == 'unet'
    meta_last = CheckpointManager.read_meta(tmp_path / 'weights' / 'last')
    assert meta_last['epoch'] == 1

    restored = CheckpointManager.restore_model(tmp_path / 'weights' / 'best')
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.arange(4.0))

    st = CheckpointManager.restore_state(tmp_path / 'weights' / 'best',
                                         target=state)
    assert int(st['step']) == 3


def test_checkpoint_meta_publishes_without_wait(tmp_path):
    """meta.json must land as soon as its tensor save commits (background
    publisher), not at the next epoch's save/wait — a crash mid-epoch
    must not leave epoch-N tensors paired with an epoch-N-1 meta."""
    import time

    state = {'params': {'w': jnp.arange(4.0)}, 'step': jnp.int32(0)}
    model_vars = {'params': {'w': jnp.arange(4.0)}}
    mgr = CheckpointManager(tmp_path / 'w', monitor='m', mode='max')
    mgr.save(state, model_vars, 7, {'m': 0.5})
    meta_p = tmp_path / 'w' / 'last' / 'meta.json'
    deadline = time.time() + 30
    while not meta_p.exists() and time.time() < deadline:
        time.sleep(0.05)
    assert meta_p.exists(), 'meta.json not published by background thread'
    assert CheckpointManager.read_meta(meta_p.parent)['epoch'] == 7
    mgr.close()


def test_plots_smoke(tmp_path, rng):
    from unet_tpu.utils.plots import (plot_confusion_matrix,
                                      plot_predictions,
                                      plot_sample_with_overlay,
                                      plot_training_curves)
    hist = {'train_loss': [1.0, 0.5], 'val_loss': [1.1, 0.6],
            'val_dice': [0.2, 0.4], 'tumor_dice': [0.1, 0.3],
            'val_iou': [0.15, 0.35]}
    plot_training_curves(hist, tmp_path / 'curves.png')
    imgs = rng.standard_normal((2, 16, 16, 1), dtype=np.float32)
    masks = (rng.random((2, 16, 16)) > 0.5).astype(np.int32)
    logits = rng.standard_normal((2, 16, 16, 2), dtype=np.float32)
    plot_predictions(imgs, masks, logits, num_samples=2,
                     save_path=tmp_path / 'preds.png')
    plot_confusion_matrix(np.array([[5, 1], [2, 8]]),
                          ['background', 'tumor'],
                          save_path=tmp_path / 'cm.png')
    plot_sample_with_overlay(imgs[0], masks[0], masks[1],
                             save_path=tmp_path / 'overlay.png')
    for f in ('curves.png', 'preds.png', 'cm.png', 'overlay.png'):
        assert (tmp_path / f).stat().st_size > 1000


def test_checkpoint_meta_publish_failure_surfaces(tmp_path, monkeypatch):
    """A failed background meta.json publication (disk full after the
    orbax commit) must raise at the next wait()/close(), not leave a
    silently unrestorable checkpoint."""
    import jax.numpy as jnp
    import pytest

    from unet_tpu.train import callbacks as cb

    cm = cb.CheckpointManager(tmp_path / 'w', monitor='m', mode='max',
                              use_async=True)
    state = {'p': jnp.zeros((2,))}

    real_dumps = cb.json.dumps

    def boom(*a, **k):
        if k.get('default') is float:  # only the meta.json publish call
            raise OSError('no space left on device')
        return real_dumps(*a, **k)    # orbax's own metadata writes pass
    monkeypatch.setattr(cb.json, 'dumps', boom)
    cm._write('last', state, {'params': state}, 0, {'m': 1.0}, None, None)
    with pytest.raises(RuntimeError, match='not resumable'):
        cm.wait()
    # the error is consumed: the manager is usable again afterwards
    monkeypatch.undo()
    cm._write('last', state, {'params': state}, 1, {'m': 2.0}, None, None)
    cm.close()
    assert (tmp_path / 'w' / 'last' / 'meta.json').exists()
