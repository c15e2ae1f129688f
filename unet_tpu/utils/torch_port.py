"""Import PyTorch reference checkpoints into unet_tpu Flax variables.

Lets users of the reference project (seagochen/unet-segment-pytorch) carry
their trained ``.pt`` checkpoints over to this framework, and powers the
numerical parity tests. Works on plain state-dict mappings (no torch
import needed if the state dict is already numpy).

Name mapping (reference unet/models/layers.py + unet.py -> unet_tpu):
  inc.double_conv.{0,1,3,4}        -> inc/{conv1,bn1,conv2,bn2}
  downN.maxpool_conv.1.double_conv -> downN/conv/...
  upN.conv.double_conv             -> upN/conv/...
  upN.up (ConvTranspose2d)         -> upN/up
  upN.attention.{W_g.0,W_g.1}      -> upN/attention/{w_g,bn_g}
  upN.attention.{W_x.0,W_x.1}      -> upN/attention/{w_x,bn_x}
  upN.attention.{psi.0,psi.1}      -> upN/attention/{psi,bn_psi}
  outc.conv / ds_outN.conv         -> outc/conv, ds_outN/conv
Tensor layout: conv OIHW -> HWIO; conv-transpose IOHW -> HWIO with the
spatial taps flipped (torch's transposed conv is the adjoint of a
correlation; lax.conv_transpose realises it as a convolution, so the
2x2 taps land mirrored).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
from flax.core import freeze
from flax.traverse_util import flatten_dict, unflatten_dict

_DC = {'conv1': '0', 'bn1': '1', 'conv2': '3', 'bn2': '4'}
_ATT = {'w_g': 'W_g.0', 'bn_g': 'W_g.1', 'w_x': 'W_x.0', 'bn_x': 'W_x.1',
        'psi': 'psi.0', 'bn_psi': 'psi.1'}


def _torch_prefix(path) -> str:
    """Translate a flax module path (up to the leaf module) to the torch
    parameter prefix."""
    parts = list(path)
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == 'inc':
            out.append('inc.double_conv')
        elif p.startswith('down') and parts[i + 1] == 'conv':
            out.append(f'{p}.maxpool_conv.1.double_conv')
            i += 1
        elif p.startswith('up') and i + 1 < len(parts) and parts[i + 1] == 'conv':
            out.append(f'{p}.conv.double_conv')
            i += 1
        elif p.startswith('up') and i + 1 < len(parts) and parts[i + 1] == 'up':
            out.append(f'{p}.up')
            i += 1
        elif p == 'attention':
            sub = parts[i + 1]
            out.append(f'attention.{_ATT[sub]}')
            i += 1
        elif p in _DC:
            out.append(_DC[p])
        elif p == 'conv' and i == len(parts) - 1:
            out.append('conv')
        else:
            out.append(p)
        i += 1
    return '.'.join(out)


def _leaf_to_torch(prefix: str, leaf: str, is_transpose: bool,
                   state: Mapping[str, Any]) -> np.ndarray:
    names = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
             'mean': 'running_mean', 'var': 'running_var'}
    t = state[f'{prefix}.{names[leaf]}']
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)
    if leaf == 'kernel':
        if is_transpose:  # torch ConvTranspose2d weight is (I, O, kh, kw)
            arr = arr.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        else:             # torch Conv2d weight is (O, I, kh, kw)
            arr = arr.transpose(2, 3, 1, 0)
    return arr


def load_torch_checkpoint(path):
    """Load a reference ``.pt`` checkpoint file.

    Accepts the reference's ModelCheckpoint payload
    ({epoch, model_state_dict, optimizer_state_dict, metrics[, config]},
    ref unet/utils/callbacks.py:185-196) or a bare state dict. Returns
    ``(state_dict, config, epoch)``. Requires torch (CPU build is fine).
    """
    import torch

    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'model_state_dict' in ckpt:
        return (ckpt['model_state_dict'], ckpt.get('config') or {},
                ckpt.get('epoch'))
    return ckpt, {}, None


def export_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of ``convert_torch_state_dict``: flatten a flax
    ``{'params', 'batch_stats'}`` tree into a reference-named torch
    state dict (numpy values; layout transposes inverted). Includes the
    ``num_batches_tracked`` entries torch BatchNorm state dicts carry,
    so the reference model's strict ``load_state_dict`` accepts it.
    """
    out: Dict[str, Any] = {}
    names = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
             'mean': 'running_mean', 'var': 'running_var'}
    for coll in ('params', 'batch_stats'):
        if coll not in variables:
            continue
        for path, arr in flatten_dict(dict(variables[coll])).items():
            *mods, leaf = path
            prefix = _torch_prefix(tuple(mods))
            arr = np.asarray(arr)
            if leaf == 'kernel':
                # guard the empty-path case so the exporter stays total
                # over arbitrary flax trees (top-level unnested leaves)
                if mods and mods[-1] == 'up':  # ConvTranspose2d: (I,O,kh,kw)
                    arr = arr[::-1, ::-1].transpose(2, 3, 0, 1).copy()
                else:                 # Conv2d: (O, I, kh, kw)
                    arr = arr.transpose(3, 2, 0, 1).copy()
            out[f'{prefix}.{names[leaf]}'] = arr
            if coll == 'batch_stats' and leaf == 'mean':
                out[f'{prefix}.num_batches_tracked'] = np.asarray(
                    0, np.int64)
    return out


def save_torch_checkpoint(path, variables: Mapping[str, Any],
                          config: Mapping[str, Any] | None = None,
                          epoch: int = 0,
                          metrics: Mapping[str, Any] | None = None) -> None:
    """Write a reference-format ``.pt`` checkpoint (the ModelCheckpoint
    payload, ref unet/utils/callbacks.py:185-196) from flax variables —
    the reverse migration path: checkpoints trained here load directly
    into the reference torch project (predict, fine-tune, AND
    ``--resume``: ref train.py:419 indexes ``optimizer_state_dict``
    unconditionally, so a version-correct fresh AdamW state is included
    — hyperparameters from the embedded config, moments reset, which
    torch treats like its own lazily-initialized Adam state).
    Requires torch (CPU build is fine)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          if np.ndim(v) else torch.tensor(v)
          for k, v in export_torch_state_dict(variables).items()}
    # one param per trainable entry (buffers excluded), in state-dict
    # order — matching AdamW(model.parameters()) on the reference side
    n_params = sum(1 for k in sd
                   if not k.endswith(('running_mean', 'running_var',
                                      'num_batches_tracked')))
    train_cfg = dict((config or {}).get('train') or {})
    dummy = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
    opt = torch.optim.AdamW(dummy,
                            lr=float(train_cfg.get('lr', 5e-5)),
                            weight_decay=float(
                                train_cfg.get('weight_decay', 1e-4)))
    torch.save({'epoch': int(epoch), 'model_state_dict': sd,
                'optimizer_state_dict': opt.state_dict(),
                'metrics': dict(metrics or {}),
                'config': dict(config or {})}, path)


def convert_torch_state_dict(state_dict: Mapping[str, Any],
                             variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Fill a flax variables template (from ``model.init`` or
    ``jax.eval_shape`` ShapeDtypeStructs) with tensors from a reference
    torch ``state_dict``. Returns plain nested dicts with the same
    structure: {'params': ..., 'batch_stats': ...}.
    """
    out = {}
    for coll in ('params', 'batch_stats'):
        if coll not in variables:
            continue
        flat = flatten_dict(dict(variables[coll]))
        new_flat = {}
        for path, template in flat.items():
            *mods, leaf = path
            prefix = _torch_prefix(tuple(mods))
            is_tr = bool(mods) and mods[-1] == 'up'
            arr = _leaf_to_torch(prefix, leaf, is_tr, state_dict)
            if arr.shape != tuple(template.shape):
                raise ValueError(
                    f'shape mismatch at {path}: torch {arr.shape} vs '
                    f'flax {tuple(template.shape)}')
            new_flat[path] = arr.astype(template.dtype)
        out[coll] = unflatten_dict(new_flat)
    return freeze(out).unfreeze()
