"""Reverse migration: checkpoints trained HERE load into the mounted
reference torch project (strict state-dict load + forward parity), and
round-trip back through the import path bit-exactly."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path('/root/reference')


@pytest.mark.parametrize('mtype', ['unet', 'attention_unet'])
def test_export_loads_into_reference_with_forward_parity(tmp_path, mtype):
    torch = pytest.importorskip('torch')
    if not REF.exists():
        pytest.skip('reference repo not mounted')
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import jax
    import jax.numpy as jnp

    from unet.models import AttentionUNet as TAttentionUNet
    from unet.models import UNet as TUNet

    from unet_tpu.models import create_model
    from unet_tpu.utils.torch_port import (convert_torch_state_dict,
                                           load_torch_checkpoint,
                                           save_torch_checkpoint)

    model = create_model(mtype, n_channels=1, n_classes=2, bilinear=True,
                         base_features=8, dtype=jnp.float32)
    variables = model.init(jax.random.key(3),
                           jnp.zeros((1, 32, 32, 1), jnp.float32),
                           train=False)
    # make batch_stats non-trivial so running-stat export is exercised
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 32, 1)).astype(np.float32)
    _, mut = model.apply(variables, jnp.asarray(x), train=True,
                         mutable=['batch_stats'])
    variables = {'params': variables['params'],
                 'batch_stats': mut['batch_stats']}

    pt = tmp_path / 'exported.pt'
    save_torch_checkpoint(pt, variables,
                          config={'model': {'type': mtype}}, epoch=5,
                          metrics={'class_dice': {'tumor': 0.5}})

    # strict load into the reference model
    tcls = TAttentionUNet if mtype == 'attention_unet' else TUNet
    tmodel = tcls(n_channels=1, n_classes=2, bilinear=True,
                  base_features=8)
    sd, cfg, epoch = load_torch_checkpoint(pt)
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()
    assert epoch == 5 and cfg['model']['type'] == mtype

    # forward parity: reference torch output == our flax output
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(variables, jnp.asarray(x),
                                   train=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=2e-5)

    # the reference's --resume path indexes optimizer_state_dict
    # unconditionally (ref train.py:419): a fresh AdamW over the
    # reference model must load it and take a step
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-4)
    ckpt = torch.load(pt, map_location='cpu', weights_only=False)
    opt.load_state_dict(ckpt['optimizer_state_dict'])
    assert opt.param_groups[0]['lr'] == pytest.approx(5e-5)  # cfg default
    tmodel.train()
    loss = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).sum()
    loss.backward()
    opt.step()
    tmodel.eval()

    # round-trip: import the exported .pt back -> bit-identical tree
    from flax.traverse_util import flatten_dict
    back = convert_torch_state_dict(sd, variables)
    for coll in ('params', 'batch_stats'):
        a = flatten_dict(dict(variables[coll]))
        b = flatten_dict(dict(back[coll]))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=str(k))
