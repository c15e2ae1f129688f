"""Export a trained checkpoint to a reference-loadable torch ``.pt``.

The reverse migration path: a model trained by this framework is
written in the reference project's ModelCheckpoint payload format
(ref unet/utils/callbacks.py:185-196), so
``/root/reference/scripts/predict.py --weights out.pt`` (or any torch
consumer of the reference's checkpoints) serves it directly. The
forward→torch weight mapping is the exact inverse of the import path
(unet_tpu/utils/torch_port.py) and is parity-tested both ways.

Usage:
  python scripts/export_torch.py --weights runs/exp/weights/best \
      --output best.pt
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--weights', required=True,
                   help='Orbax checkpoint dir (e.g. runs/exp/weights/best)')
    p.add_argument('--output', required=True, help='output .pt path')
    p.add_argument('--device', default=None,
                   help='"cpu" forces the CPU backend (no accelerator '
                        'needed to export)')
    args = p.parse_args()

    if (args.device or '').lower() == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from unet_tpu.train.callbacks import CheckpointManager
    from unet_tpu.utils.torch_port import save_torch_checkpoint

    meta = CheckpointManager.read_meta(args.weights)
    variables = CheckpointManager.restore_model(args.weights)
    save_torch_checkpoint(args.output, variables,
                          config=meta.get('config') or {},
                          epoch=meta.get('epoch') or 0,
                          metrics=meta.get('metrics') or {})
    print(f'exported {args.weights} -> {args.output} '
          f"(epoch {meta.get('epoch')}, "
          f"monitor {meta.get('monitor_value')})")


if __name__ == '__main__':
    main()
