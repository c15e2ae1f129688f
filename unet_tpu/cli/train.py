#!/usr/bin/env python
"""Train UNet / Attention U-Net for lung-tumor segmentation on TPU.

Flag-for-flag compatible with the reference CLI (reference
scripts/train.py:61-100): --config --data --img-size --batch-size
--workers --epochs --lr --resume --name --project --device, plus TPU
extensions (--synthetic for a dataset-free smoke run).

TPU-native execution model (vs the reference's eager per-batch loop,
train.py:103-161):
  * one jitted super-batch step does accumulate+clip+AdamW+EMA on device
  * augmentation runs batched on device (unet_tpu.data.augmentations)
  * eval streams an on-device confusion matrix; only (C, C) ints hit host
  * batches are sharded over a `data` mesh (GSPMD); params replicated
  * checkpoints via Orbax (last/best, config embedded; resume supported)
"""

import argparse
import time
from collections import deque
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train lung tumor segmentation')
    p.add_argument('--config', type=str,
                   default='configs/lung_tumor.yaml')
    p.add_argument('--data', type=str, default=None,
                   help='dataset root (overrides config)')
    p.add_argument('--img-size', type=int, default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--workers', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--resume', type=str, default=None,
                   help='checkpoint dir (e.g. runs/exp/weights/last)')
    p.add_argument('--init-weights', type=str, default=None,
                   help='initialize model params/batch-stats from a '
                        'checkpoint before training (an Orbax model dir '
                        'or a reference torch .pt — enables fine-tuning '
                        'from reference checkpoints and the cross-'
                        'framework training controls in docs/parity_r3). '
                        'Unlike --resume, the optimizer/scheduler/epoch '
                        'start fresh. The file must be readable on every '
                        'process in multi-host runs.')
    p.add_argument('--name', type=str, default=None)
    p.add_argument('--project', type=str, default=None)
    p.add_argument('--device', type=str, default=None,
                   help='"cpu" forces the CPU backend')
    p.add_argument('--synthetic', action='store_true',
                   help='use a synthetic dataset (no files needed)')
    p.add_argument('--synthetic-volumes', type=int, default=12,
                   help='synthetic dataset: number of volumes')
    p.add_argument('--synthetic-slices', type=int, default=4,
                   help='synthetic dataset: slices per volume')
    p.add_argument('--synthetic-tumor-radius', type=str, default=None,
                   metavar='MIN,MAX',
                   help='synthetic dataset: tumor radius range as a '
                        'fraction of img_size (default 0.02,0.05). At '
                        'small img_size the default tumors are only a '
                        'few px across; scale this up to keep absolute '
                        'tumor size comparable to a 512px run')
    p.add_argument('--cache', type=str, default=None,
                   help='slice-cache blob path: built (natively) if '
                        'missing, then memory-mapped for zero-decode '
                        'epoch streaming')
    p.add_argument('--profile-dir', type=str, default=None,
                   help='write a jax.profiler trace of epoch 1 here')
    p.add_argument('--debug-nans', action='store_true',
                   help='fail fast on the first NaN (jax_debug_nans)')
    p.add_argument('--coordinator', type=str, default=None,
                   help='multi-host: coordinator address host:port')
    p.add_argument('--num-processes', type=int, default=None,
                   help='multi-host: total process count')
    p.add_argument('--process-id', type=int, default=None,
                   help='multi-host: this process index')
    return p.parse_args()


def apply_overrides(config, args):
    """CLI-over-YAML override merge (ref train.py:208-225)."""
    if args.data:
        config['data']['root'] = args.data
    if args.img_size:
        config['data']['img_size'] = args.img_size
    if args.batch_size:
        config['data']['batch_size'] = args.batch_size
    if args.workers:
        config['data']['num_workers'] = args.workers
    if args.epochs:
        config['train']['epochs'] = args.epochs
    if args.lr:
        config['train']['lr'] = args.lr
    if args.name:
        config['output']['experiment_name'] = args.name
    if args.project:
        config['output']['save_dir'] = args.project
    if args.device:
        config['device'] = args.device
    return config


def main():
    args = parse_args()

    # Backend choice must precede jax import side effects.
    from unet_tpu.utils.config import load_config
    config = apply_overrides(load_config(args.config), args)
    import jax
    if str(config.get('device', '')).lower() == 'cpu':
        # env vars are too late here (TPU plugins may import jax from
        # sitecustomize at interpreter start) — set the config directly
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    # ---- multi-host runtime (must precede any device query) ----
    from unet_tpu.core.distributed import (init_distributed, process_count,
                                           process_index)
    if args.num_processes and args.num_processes > 1:
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    n_proc = process_count()
    is_main = process_index() == 0
    log = print if is_main else (lambda *a, **k: None)

    from unet_tpu.core.setup import donate_argnums, enable_compilation_cache
    enable_compilation_cache()

    from unet_tpu.core.mesh import (batch_sharding, create_mesh,
                                    replicate)
    from unet_tpu.ops.bitpack import pack_masks, unpack_masks
    from unet_tpu.data import (AugmentConfig, BatchLoader, SliceDataset,
                               SyntheticSliceDataset,
                               augment_batch_seeded,
                               normalize_batch, prefetch_to_device)
    from unet_tpu.models import create_model
    from unet_tpu.train import (CheckpointManager, EarlyStopping,
                                SegmentationMetrics, create_loss_function,
                                create_optimizer, create_scheduler,
                                ema_reinit, init_train_state, make_eval_step,
                                make_train_step)
    from unet_tpu.utils.config import (describe_devices, get_nested_metric,
                                       increment_path, set_seed,
                                       validate_config)
    from unet_tpu.utils.plots import plot_predictions, plot_training_curves
    from unet_tpu.utils.profiling import nan_guard, trace

    if getattr(args, 'debug_nans', False):
        nan_guard(True)
    validate_config(config)
    seed = config.get('seed', 42)
    set_seed(seed)
    log(f'Using backend: {describe_devices()}')
    if n_proc > 1:
        log(f'Multi-host: {n_proc} processes, '
            f'{len(jax.devices())} global devices')

    # ---- resume target (resolve before the run dir: `--resume auto`
    # continues inside the newest existing run instead of creating a
    # fresh one — the preemption-recovery flow). Multi-host: ONLY
    # process 0 consults the filesystem (checkpoints live on its disk);
    # its decision is broadcast so every process runs the same control
    # flow — workers independently resolving against their own (empty)
    # disks would diverge into mismatched collective programs. ----
    resume_path = args.resume
    auto_run_dir = None
    if n_proc > 1:
        from unet_tpu.core.distributed import broadcast_from_main
        if is_main and resume_path == 'auto':
            found = CheckpointManager.find_auto_resume(
                config['output']['save_dir'],
                config['output']['experiment_name'])
            resume_path = None if found is None else str(found)
        resume_path = broadcast_from_main(resume_path)
        if args.resume == 'auto' and resume_path is not None:
            auto_run_dir = Path(resume_path).parent.parent
        if args.resume == 'auto':
            log('--resume auto: '
                + (f'continuing {auto_run_dir}' if resume_path
                   else 'no previous checkpoint found, starting fresh'))
    elif resume_path == 'auto':
        found = CheckpointManager.find_auto_resume(
            config['output']['save_dir'],
            config['output']['experiment_name'])
        if found is None:
            log('--resume auto: no previous checkpoint found, '
                'starting fresh')
            resume_path = None
        else:
            resume_path = str(found)
            auto_run_dir = found.parent.parent
            log(f'--resume auto: continuing {auto_run_dir}')

    # ---- run dir (process 0 owns all filesystem artifacts) ----
    if auto_run_dir is not None:
        save_dir = auto_run_dir
        weights_dir = save_dir / 'weights'
    elif is_main:
        save_dir = increment_path(Path(config['output']['save_dir'])
                                  / config['output']['experiment_name'])
        weights_dir = save_dir / 'weights'
        weights_dir.mkdir(parents=True, exist_ok=True)
    else:
        save_dir = (Path(config['output']['save_dir'])
                    / config['output']['experiment_name'])
        weights_dir = save_dir / 'weights'
    log(f'Results will be saved to: {save_dir}')

    # ---- data ----
    data_cfg = config['data']
    img_size = data_cfg['img_size']
    batch_size = data_cfg['batch_size']
    if args.synthetic:
        ds_kwargs = dict(num_volumes=args.synthetic_volumes,
                         slices_per_volume=args.synthetic_slices,
                         img_size=img_size, seed=seed,
                         val_ratio=data_cfg.get('val_ratio', 0.2))
        if args.synthetic_tumor_radius:
            lo, hi = (float(v) for v in
                      args.synthetic_tumor_radius.split(','))
            ds_kwargs['tumor_radius'] = (lo, hi)
        train_ds = SyntheticSliceDataset(split='train', **ds_kwargs)
        val_ds = SyntheticSliceDataset(split='val', **ds_kwargs)
    elif getattr(args, 'cache', None) or data_cfg.get('cache'):
        from unet_tpu.data.cache import CachedSliceDataset, build_cache
        cache_path = getattr(args, 'cache', None) or data_cfg['cache']
        if not Path(cache_path).exists():
            log(f'Building slice cache at {cache_path} ...')
            build_cache(data_cfg['root'], cache_path, img_size=img_size)
        kw = dict(val_ratio=data_cfg.get('val_ratio', 0.2), seed=seed)
        train_ds = CachedSliceDataset(cache_path, 'train', **kw)
        val_ds = CachedSliceDataset(cache_path, 'val', **kw)
    else:
        train_ds = SliceDataset(data_cfg['root'], 'train',
                                val_ratio=data_cfg.get('val_ratio', 0.2),
                                seed=seed, img_size=img_size)
        val_ds = SliceDataset(data_cfg['root'], 'val',
                              val_ratio=data_cfg.get('val_ratio', 0.2),
                              seed=seed, img_size=img_size)
    workers = data_cfg.get('num_workers', 8)
    # Multi-host input sharding: every process computes the same global
    # sample order and loads only its batch_size/n_proc rows of each
    # batch (core.distributed design; SURVEY.md §5). Val tail batches
    # are padded to a static shape and masked in the eval step.
    local = (process_index(), n_proc) if n_proc > 1 else None
    # uint8 on the wire: 4x less host->device traffic; cast on device
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True,
                               drop_last=True, seed=seed,
                               num_threads=workers, raw_uint8=True,
                               local_slice=local)
    val_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                             num_threads=workers, raw_uint8=True,
                             local_slice=local, pad_tail=n_proc > 1)
    log(f'Train samples: {len(train_ds)}, Val samples: {len(val_ds)}')

    aug_cfg_yaml = config.get('augmentation', {})
    augment_enabled = aug_cfg_yaml.get('enabled', True)
    aug_cfg = AugmentConfig.from_yaml(aug_cfg_yaml)

    # ---- mesh ----
    tpu_cfg = config.get('tpu', {})
    dp = tpu_cfg.get('data_parallel', -1)
    n_dev = len(jax.devices())
    dp = n_dev if dp in (-1, None) else dp
    mesh = create_mesh(jax.devices()[:dp], data_parallel=dp)
    data_sh = (batch_sharding(mesh, batch_axis=0)
               if mesh.devices.size > 1 else None)     # eval batches
    sb_sh = (batch_sharding(mesh, batch_axis=1)
             if mesh.devices.size > 1 else None)       # (A, B, ...) train
                                                       # super-batches
    if batch_size % dp != 0:
        raise ValueError(f'batch_size {batch_size} must be divisible by '
                         f'the data-parallel degree {dp}')

    # ---- model ----
    model_cfg = config['model']
    dtype = jnp.bfloat16 if tpu_cfg.get('compute_dtype',
                                        'bfloat16') == 'bfloat16' \
        else jnp.float32
    deep_supervision = model_cfg.get('deep_supervision', False)
    mtype = model_cfg.get('type', 'unet').lower()
    if mtype == 'attention':
        mtype = 'attention_unet'
    model = create_model(mtype,
                         n_channels=model_cfg['n_channels'],
                         n_classes=model_cfg['n_classes'],
                         bilinear=model_cfg.get('bilinear', True),
                         base_features=model_cfg.get('base_features', 64),
                         deep_supervision=deep_supervision, dtype=dtype,
                         use_fused_gate=tpu_cfg.get(
                             'fused_attention_gate'))
    n_classes = model_cfg['n_classes']

    # ---- EMA config (code default enabled=True when key absent,
    # matching ref train.py:316) ----
    ema_cfg = config.get('ema', {})
    use_ema = ema_cfg.get('enabled', True)
    ema_decay = ema_cfg.get('decay', 0.99)
    ema_warmup_epochs = ema_cfg.get('warmup_epochs', 5) if use_ema else 0
    if use_ema:
        log(f'Using EMA with decay={ema_decay}, '
              f'warmup={ema_warmup_epochs} epochs')

    # ---- loss ----
    loss_cfg = config['loss']
    loss_fn = create_loss_function(
        loss_type=loss_cfg['type'],
        ce_weight=loss_cfg.get('ce_weight', 1.0),
        dice_weight=loss_cfg.get('dice_weight', 1.0),
        class_weights=loss_cfg.get('class_weights'),
        balanced_class_weight=loss_cfg.get('balanced_class_weight', 0.5),
        deep_supervision=deep_supervision)
    log(f"Loss function: {loss_cfg['type']}"
          + (' + Deep Supervision' if deep_supervision else ''))

    # ---- optimizer / state ----
    train_cfg = config['train']
    base_lr = train_cfg['lr']
    tx = create_optimizer(base_lr,
                          weight_decay=train_cfg.get('weight_decay', 1e-4),
                          grad_clip=train_cfg.get('grad_clip', 0.0))
    sample = jnp.zeros((batch_size, img_size, img_size,
                        model_cfg['n_channels']), jnp.float32)
    state = init_train_state(model, jax.random.key(seed), sample, tx,
                             use_ema=use_ema)
    if getattr(args, 'init_weights', None):
        init_src = Path(args.init_weights)
        log(f'Initializing weights from {init_src}')
        template = {'params': state.params,
                    'batch_stats': state.batch_stats}
        if init_src.is_file():  # reference torch .pt
            from unet_tpu.utils.torch_port import (
                convert_torch_state_dict, load_torch_checkpoint)
            sd, _, _ = load_torch_checkpoint(init_src)
            restored = convert_torch_state_dict(sd, template)
        else:                   # our Orbax model dir (weights/<name>)
            restored = CheckpointManager.restore_model(init_src,
                                                       target=template)
        restored = jax.tree.map(jnp.asarray, restored)
        state = state.replace(params=restored['params'],
                              batch_stats=restored['batch_stats'])
        if use_ema:
            state = ema_reinit(state)
    state = replicate(mesh, state)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    log(f'Model parameters: {n_params:,}')

    accum = train_cfg.get('accumulation_steps', 1)
    if accum > 1:
        log(f'Gradient accumulation: {accum} steps '
              f'(effective batch={batch_size * accum})')
    if jax.default_backend() == 'tpu' and batch_size % 8 != 0:
        # the batch dim maps to the 8-wide sublane axis: a batch of 4
        # pads to 8 and costs nearly a full batch-8 step (measured
        # 138.8 ms/step at b4 vs 124.1 at b8, 512^2) — same effective
        # batch via batch 8 + halved accumulation_steps is ~2x faster
        log(f'WARNING: batch_size={batch_size} is not a multiple of 8; '
            f'TPU pads the batch dim to the 8-wide sublane axis and '
            f'wastes the pad rows. Prefer batch_size=8 with '
            f'accumulation_steps={max(1, accum * batch_size // 8)} '
            f'(same effective batch, ~2x faster at batch 4).')

    train_step = jax.jit(
        make_train_step(model, loss_fn, tx, accum_steps=accum,
                        ema_decay=ema_decay, use_ema=use_ema),
        donate_argnums=donate_argnums(0))
    eval_step = jax.jit(make_eval_step(model, loss_fn, n_classes,
                                       with_weights=n_proc > 1))

    # ---- scheduler / callbacks ----
    epochs = train_cfg['epochs']
    sched_kind, scheduler = create_scheduler(config.get('scheduler', {}),
                                             base_lr, epochs)
    es_cfg = config.get('early_stopping', {})
    early_stopping = EarlyStopping(
        patience=es_cfg.get('patience', 20),
        mode=es_cfg.get('mode', 'max')) if es_cfg.get('enabled', True) \
        else None
    monitor = es_cfg.get('monitor', 'class_dice.tumor')
    checkpoint = CheckpointManager(weights_dir, monitor=monitor,
                                   mode=es_cfg.get('mode', 'max'),
                                   save_last=config['output'].get(
                                       'save_last', True),
                                   save_best=config['output'].get(
                                       'save_best', True)) if is_main \
        else None
    metrics = SegmentationMetrics(n_classes, ['background', 'tumor'])
    log(f'Monitoring metric: {monitor}')

    # ---- resume ----
    start_epoch = 0
    if resume_path:
        log(f'Resuming from {resume_path}')
        if n_proc > 1:
            # checkpoint files exist only on process 0: it restores and
            # broadcasts the full TrainState + the control metadata;
            # workers contribute a same-structure tree (values ignored)
            from unet_tpu.core.distributed import (
                broadcast_from_main, broadcast_pytree_from_main)
            if is_main:
                meta = CheckpointManager.read_meta(resume_path)
                restored = CheckpointManager.restore_state(resume_path,
                                                           state)
                host_state = jax.tree.map(np.asarray, restored)
            else:
                meta = None
                host_state = jax.tree.map(np.asarray, state)
            meta = broadcast_from_main(
                None if meta is None else {
                    'epoch': meta.get('epoch', -1),
                    'step': meta.get('step'),
                    'scheduler': meta.get('scheduler')})
            state = broadcast_pytree_from_main(host_state)
        else:
            meta = CheckpointManager.read_meta(resume_path)
            state = CheckpointManager.restore_state(resume_path, state)
        state = replicate(mesh, state)
        if meta.get('scheduler') and sched_kind == 'plateau':
            scheduler.load_state_dict(meta['scheduler'])
        start_epoch = meta.get('epoch', -1) + 1
        log(f'Resumed from epoch {start_epoch} '
            f'(optimizer step {meta.get("step")})')
        # seed the best-tracker from the existing best checkpoint so a
        # post-resume epoch can't demote a better pre-resume 'best'
        # (process 0 only — it owns the checkpoint manager)
        best_meta_p = Path(resume_path).parent / 'best' / 'meta.json'
        if checkpoint is not None and best_meta_p.exists():
            prev = CheckpointManager.read_meta(best_meta_p.parent)
            if prev.get('monitor_value') is not None:
                checkpoint.best_value = prev['monitor_value']
                checkpoint.best_epoch = prev.get('epoch', -1)

    history = {k: [] for k in ('train_loss', 'val_loss', 'val_dice',
                               'val_iou', 'val_accuracy', 'tumor_dice',
                               'lr')}

    aug_step = 0  # host counter; the PRNG key derives in-program
    micro_bs = batch_size

    def run_validation(params, batch_stats):
        metrics.reset()
        # accumulate on device: a float()/np.asarray() per batch would
        # force a host sync (measured ~28 ms round-trip through the TPU
        # tunnel) and stall the prefetch pipeline every step
        loss_sum, cm_sum, n_batches = None, None, 0

        def packed_val_batches():
            for images, masks in val_loader:
                yield images, pack_masks(masks)  # 1 bit/px on the wire

        for b, (images, masks) in enumerate(
                prefetch_to_device(packed_val_batches(), data_sh)):
            masks = unpack_masks(masks, img_size)
            images = normalize_batch(images.astype(jnp.float32) / 255.0)
            if n_proc > 1:
                # pad rows (repeated tail samples) get weight 0: the
                # confusion matrix — hence every monitored metric — is
                # exact; see make_eval_step(with_weights=True)
                w = np.zeros((batch_size,), np.float32)
                w[:val_loader.tail_valid(b)] = 1.0
                # plain numpy: multi-controller jit treats host arrays
                # as replicated (identical on every process)
                loss, cm = eval_step(params, batch_stats, images,
                                     masks, w)
            else:
                loss, cm = eval_step(params, batch_stats, images,
                                     masks)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            cm_sum = cm if cm_sum is None else cm_sum + cm
            n_batches += 1
        if cm_sum is not None:
            metrics.update_from_matrix(cm_sum)
        results = metrics.compute()
        results['loss'] = (float(loss_sum) / n_batches if n_batches
                           else 0.0)
        return results

    log('\nStarting training...')
    log('=' * 60)
    profile_dir = getattr(args, 'profile_dir', None)
    # pre-assign the validated weights: a resume of an already-finished
    # run (start_epoch == epochs) skips the loop entirely and the
    # post-loop best-reload/visualization must still work
    if use_ema and start_epoch > ema_warmup_epochs and state.ema is not None:
        val_params, val_stats = state.ema.params, state.ema.batch_stats
    else:
        val_params, val_stats = state.params, state.batch_stats

    for epoch in range(start_epoch, epochs):
        lr = scheduler(epoch) if sched_kind == 'epoch' else scheduler.lr
        log(f'\nEpoch {epoch + 1}/{epochs} (lr={lr:.2e})')
        t0 = time.time()
        epoch_trace = trace(profile_dir) if (
            profile_dir and epoch == start_epoch) else None
        if epoch_trace:
            epoch_trace.__enter__()

        # ---- train ----
        loss_sums, n_micro = [], 0  # device scalars; sync at epoch end

        def host_superbatches():
            """Stack ``accum`` microbatches into one super-batch payload
            on the host: images stay uint8 and masks ship bit-packed
            (ops/bitpack) — on a thin host link the wire is the train
            loop's bottleneck (measured; docs/DESIGN.md 'End-to-end
            input pipeline')."""
            nonlocal n_micro
            pending = []

            def emit(pending_batches):
                k = len(pending_batches)
                mb = np.zeros((accum,), np.float32)
                mb[:k] = 1.0
                while len(pending_batches) < accum:  # pad (masked out)
                    pending_batches.append(pending_batches[-1])
                imgs = np.stack([b[0] for b in pending_batches])
                msks = pack_masks(
                    np.stack([b[1] for b in pending_batches]))
                return imgs, msks, mb

            for images, masks in train_loader:
                pending.append((images, masks))
                n_micro += 1
                if len(pending) == accum:
                    yield emit(pending)
                    pending = []
            if pending:  # leftover flush (ref train.py:153-159)
                yield emit(pending)

        # microbatch-valid masks ride a host-side FIFO next to the
        # device prefetch: multi-controller jit needs them as replicated
        # numpy, never device arrays
        mb_queue = deque()

        def device_stream():
            for imgs, msks, mb in host_superbatches():
                mb_queue.append(mb)
                yield imgs, msks

        def step(imgs, msks, mask):
            nonlocal state, aug_step
            imgs = imgs.astype(jnp.float32) / 255.0
            msks = unpack_masks(msks, img_size)
            if augment_enabled:
                flat_i = imgs.reshape(accum * micro_bs, img_size, img_size,
                                      -1)
                flat_m = msks.reshape(accum * micro_bs, img_size, img_size)
                sdata = np.asarray([seed + 1, aug_step], np.uint32)
                aug_step += 1
                flat_i, flat_m = augment_batch_seeded(flat_i, flat_m,
                                                      sdata, aug_cfg)
                imgs = flat_i.reshape(accum, micro_bs, img_size, img_size,
                                      -1)
                msks = flat_m.reshape(accum, micro_bs, img_size, img_size)
            else:
                imgs = normalize_batch(imgs)
            # lr/mask stay host-side: multi-controller jit treats numpy
            # inputs as replicated; jnp.asarray would commit them to one
            # local device and clash with the global batch arrays
            state, loss_sum = train_step(state, imgs, msks,
                                         np.float32(lr), mask)
            # keep as a device scalar: forcing float() here would stall
            # the async dispatch pipeline every super-batch
            loss_sums.append(loss_sum)

        # double-buffered device prefetch: super-batch i+1 crosses the
        # host link while i computes (same machinery as the val loop)
        for imgs, msks in prefetch_to_device(device_stream(), sb_sh):
            step(imgs, msks, mb_queue.popleft())
        train_loss = float(sum(float(s) for s in loss_sums)) / max(n_micro, 1)
        # the float() syncs above force every dispatched step to retire,
        # so this is honest end-to-end train wall time (host pipeline +
        # transfers + compute), exclusive of validation
        train_dt = time.time() - t0
        if epoch_trace:
            epoch_trace.__exit__(None, None, None)

        # ---- EMA warmup state machine (ref train.py:459-467) ----
        use_ema_for_val = use_ema and epoch >= ema_warmup_epochs
        if use_ema and epoch == ema_warmup_epochs:
            state = ema_reinit(state)
            log(f'  EMA re-initialized from training model at epoch '
                  f'{epoch + 1}')
        if use_ema_for_val:
            val_params, val_stats = state.ema.params, state.ema.batch_stats
            val_model_name = 'EMA model'
        else:
            val_params, val_stats = state.params, state.batch_stats
            val_model_name = ('training model (EMA warmup)' if use_ema
                              else 'training model')

        val_results = run_validation(val_params, val_stats)
        dt = time.time() - t0

        history['train_loss'].append(train_loss)
        history['val_loss'].append(val_results['loss'])
        history['val_dice'].append(val_results['mean_dice'])
        history['val_iou'].append(val_results['mean_iou'])
        history['val_accuracy'].append(val_results['pixel_accuracy'])
        history['tumor_dice'].append(
            val_results['class_dice'].get('tumor', 0.0))
        history['lr'].append(lr)

        log(f'  Train Loss: {train_loss:.4f}  ({train_dt:.1f}s, '
              f'{len(train_ds) / max(train_dt, 1e-9):.1f} slices/s; '
              f'val {dt - train_dt:.1f}s)')
        log(f"  Val [{val_model_name}]: Loss={val_results['loss']:.4f} | "
              f"Dice={val_results['mean_dice']:.4f} | "
              f"IoU={val_results['mean_iou']:.4f} | "
              f"Acc={val_results['pixel_accuracy']:.4f}")
        log(f"  Tumor Dice: {val_results['class_dice'].get('tumor', 0):.4f}"
              f" | Tumor IoU: {val_results['class_iou'].get('tumor', 0):.4f}")

        # ---- checkpoint (same weights as validated, ref train.py:499;
        # process 0 only — the state is fully replicated) ----
        if checkpoint is not None:
            sched_state = (scheduler.state_dict() if sched_kind == 'plateau'
                           else None)
            checkpoint.save(state, {'params': val_params,
                                    'batch_stats': val_stats},
                            epoch, val_results, config=config,
                            scheduler_state=sched_state)

        monitored = get_nested_metric(val_results, monitor)
        if sched_kind == 'plateau':
            scheduler.step(monitored)
        if early_stopping and early_stopping(monitored):
            log('\nEarly stopping triggered!')
            break

    log('\n' + '=' * 60)
    log('Training complete!')
    if checkpoint is not None:
        checkpoint.close()  # drain in-flight async saves before reading

    if not is_main:
        return history
    plot_training_curves(history, save_path=save_dir / 'training_curves.png')
    # machine-readable epoch history next to the curves (the reference
    # keeps history only inside the PNG, train.py:531-532)
    import json
    (save_dir / 'history.json').write_text(
        json.dumps({k: [float(v) for v in vs] for k, vs in history.items()},
                   indent=1))

    # ---- reload best + visualize tumor-containing val samples
    # (ref train.py:531-577). Runs on process 0 only, so the apply below
    # must be a process-local computation: materialize the (replicated)
    # weights to host first instead of touching the global arrays. ----
    val_params = jax.tree.map(np.asarray, val_params)
    val_stats = jax.tree.map(np.asarray, val_stats)
    best_dir = weights_dir / 'best'
    if best_dir.exists():
        restored = CheckpointManager.restore_model(
            best_dir, target={'params': val_params,
                              'batch_stats': val_stats})
        val_params = restored['params']
        val_stats = restored['batch_stats']
        meta = CheckpointManager.read_meta(best_dir)
        log(f"Loaded best model from epoch {meta.get('epoch', 0) + 1}")

    # A fresh single-process loader: in multi-host runs val_loader has
    # local_slice/pad_tail set, so it would yield only 1/n_proc of the
    # validation samples (plus duplicated pad rows) to this process.
    viz_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                             num_threads=workers, raw_uint8=True)
    tumor_images, tumor_masks = [], []
    for images, masks in viz_loader:
        for i in range(images.shape[0]):
            if masks[i].sum() > 0:
                tumor_images.append(images[i])
                tumor_masks.append(masks[i])
            if len(tumor_images) >= 8:
                break
        if len(tumor_images) >= 8:
            break
    if tumor_images:
        timgs = normalize_batch(jnp.asarray(np.stack(tumor_images),
                                            jnp.float32) / 255.0)
        tumor_masks = [m.astype(np.int32) for m in tumor_masks]
        tmasks = np.stack(tumor_masks)
        logits = model.apply({'params': val_params,
                              'batch_stats': val_stats}, timgs, train=False)
        plot_predictions(np.asarray(timgs), tmasks, np.asarray(logits),
                         num_samples=min(4, len(tumor_images)),
                         save_path=save_dir / 'val_predictions.png',
                         class_names=['background', 'tumor'])
    else:
        log('Warning: no tumor samples found in validation set')

    log(f'\nResults saved to: {save_dir}')
    if history['tumor_dice']:
        best_dice = max(history['tumor_dice'])
        best_epoch = history['tumor_dice'].index(best_dice) + 1
        log(f'Best Tumor Dice: {best_dice:.4f} at epoch {best_epoch}')
    return history


if __name__ == '__main__':
    main()
