#!/usr/bin/env python
"""Overfit sanity harness: verify the full stack can drive tumor Dice
above 0.8 on a handful of samples.

Mirrors the reference scripts/overfit_test.py (same CLI: --data --samples
--epochs --lr --loss{dice_bce,dice,ce} --model{unet,attention_unet}
--img-size; same procedure: pick the top-N slices by tumor area among
those with >100 tumor pixels, train with Adam lr=1e-3 for 200 epochs on
just those samples, PASS iff final tumor Dice > 0.8,
ref overfit_test.py:103-117, 131-156, 288-297). Adds --synthetic so the
harness doubles as a dataset-free end-to-end integration test
(SURVEY.md §4 recommendation).
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Overfit sanity test')
    p.add_argument('--data', type=str, default='./dataset')
    p.add_argument('--samples', type=int, default=4)
    p.add_argument('--epochs', type=int, default=200)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--loss', type=str, default='dice_bce',
                   choices=['dice_bce', 'dice', 'ce'])
    p.add_argument('--model', type=str, default='unet',
                   choices=['unet', 'attention_unet'])
    p.add_argument('--img-size', type=int, default=256)
    p.add_argument('--synthetic', action='store_true')
    p.add_argument('--output', type=str, default='overfit_results')
    p.add_argument('--base-features', type=int, default=64)
    p.add_argument('--device', type=str, default=None,
                   help="force a backend (e.g. 'cpu'); default: JAX auto")
    return p.parse_args()


def run_overfit(args=None):
    if args is None:
        args = parse_args()

    import jax
    if str(getattr(args, 'device', None) or '').lower() == 'cpu':
        # same in-process backend pin as the train/predict CLIs
        # (cli/train.py:105-108): env vars are too late when a TPU
        # plugin imports jax from sitecustomize at interpreter start
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax

    from unet_tpu.data import (SliceDataset, SyntheticSliceDataset,
                               normalize_batch)
    from unet_tpu.models import create_model
    from unet_tpu.train import (SegmentationMetrics, create_loss_function,
                                init_train_state, make_eval_step,
                                make_train_step)
    from unet_tpu.utils.plots import (plot_predictions,
                                      plot_sample_with_overlay,
                                      plot_training_curves)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    # ---- pick the N largest-tumor slices (>100 px, ref :103-117) ----
    if args.synthetic:
        ds = SyntheticSliceDataset(num_volumes=4, slices_per_volume=4,
                                   img_size=args.img_size, split='all',
                                   tumor_prob=1.0,
                                   tumor_radius=(0.08, 0.15))
    else:
        ds = SliceDataset(args.data, split='train', img_size=args.img_size)
    areas = []
    for i in range(len(ds)):
        _, m = ds.load(i)
        a = int(m.sum())
        if a > 100:
            areas.append((a, i))
    if not areas:
        print('FAIL: no slices with >100 tumor pixels found')
        return False
    areas.sort(reverse=True)
    picked = [i for _, i in areas[:args.samples]]
    print(f'Selected {len(picked)} samples with tumor areas '
          f'{[a for a, _ in areas[:args.samples]]}')

    samples = [ds.load(i) for i in picked]
    images = np.stack([s[0] for s in samples])[..., None]
    masks = np.stack([s[1] for s in samples]).astype(np.int32)

    # visualize the training samples (ref :124)
    plot_predictions((images - 0.5) / 0.5, masks, masks,
                     num_samples=len(picked),
                     save_path=out_dir / 'overfit_samples.png')

    # ---- model: attention_unet forces deep supervision (ref :131-133) ----
    deep_supervision = args.model == 'attention_unet'
    model = create_model(args.model, base_features=args.base_features,
                         deep_supervision=deep_supervision,
                         dtype=jnp.bfloat16 if jax.default_backend() == 'tpu'
                         else jnp.float32)
    loss_fn = create_loss_function(args.loss,
                                   deep_supervision=deep_supervision)

    # plain Adam, like the reference (overfit_test.py:156)
    def make(learning_rate):
        return optax.adam(learning_rate)
    tx = optax.inject_hyperparams(make)(learning_rate=args.lr)

    state = init_train_state(
        model, jax.random.key(0),
        jnp.zeros((len(picked), args.img_size, args.img_size, 1)), tx)
    from unet_tpu.core.setup import donate_argnums, enable_compilation_cache
    enable_compilation_cache()
    train_step = jax.jit(make_train_step(model, loss_fn, tx, accum_steps=1),
                         donate_argnums=donate_argnums(0))
    eval_step = jax.jit(make_eval_step(model, loss_fn, num_classes=2))

    x = normalize_batch(jnp.asarray(images, jnp.float32))
    y = jnp.asarray(masks)
    sb_x = x[None]  # one microbatch of the whole sample set
    sb_y = y[None]
    mb_mask = jnp.ones((1,), jnp.float32)
    lr = jnp.float32(args.lr)

    metrics = SegmentationMetrics(2, ['background', 'tumor'])
    history = {'train_loss': [], 'tumor_dice': []}
    for epoch in range(args.epochs):
        state, loss_sum = train_step(state, sb_x, sb_y, lr, mb_mask)
        _, cm = eval_step(state.params, state.batch_stats, x, y)
        metrics.reset()
        metrics.update_from_matrix(cm)
        dice = metrics.compute()['class_dice']['tumor']
        history['train_loss'].append(float(loss_sum))
        history['tumor_dice'].append(dice)
        if (epoch + 1) % 20 == 0 or epoch == 0:
            print(f'epoch {epoch + 1:4d}: loss={float(loss_sum):.4f} '
                  f'tumor_dice={dice:.4f}')

    final_dice = history['tumor_dice'][-1]
    plot_training_curves(
        {'train_loss': history['train_loss'],
         'tumor_dice': history['tumor_dice']},
        save_path=out_dir / 'overfit_curves.png')

    import jax.nn
    logits = model.apply({'params': state.params,
                          'batch_stats': state.batch_stats}, x, train=False)
    preds = np.asarray(logits).argmax(-1)
    plot_predictions(np.asarray(x), masks, preds,
                     num_samples=len(picked),
                     save_path=out_dir / 'overfit_predictions.png')
    plot_sample_with_overlay(np.asarray(x)[0], masks[0], preds[0],
                             save_path=out_dir / 'overfit_overlay.png')

    passed = final_dice > 0.8
    print('=' * 60)
    if passed:
        print(f'PASS: final tumor dice {final_dice:.4f} > 0.8')
    else:
        print(f'FAIL: final tumor dice {final_dice:.4f} <= 0.8')
        print('Diagnosis hints: check data loading (masks nonzero?), '
              'loss wiring (does train loss fall?), lr too small/large, '
              'or too few epochs.')
    return passed


def main() -> int:
    """console_script entry: exit 0 on PASS."""
    return 0 if run_overfit() else 1


if __name__ == '__main__':
    sys.exit(main())
