"""Golden parity: reference DLA-34 backbone vs tpucv DLA34 with imported
weights — validates the recursive Tree/Root aggregation numerically (the
CenterNet head intentionally differs: resize+conv vs ConvTranspose)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


def test_golden_dla34_levels():
    for name in ("thop", "torchvision"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, REF)
    import torch
    from core.models.centernet_model import DLA, BasicBlock

    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_dla34, merge_into_variables
    from tpucv.models.centernet import DLA34

    torch.manual_seed(0)
    tm = DLA([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512],
             block=BasicBlock, return_levels=True)
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = DLA34()
    x_np = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, import_dla34(sd))

    with torch.no_grad():
        t_levels = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    j_levels = model.apply(variables, jnp.asarray(x_np))
    assert len(t_levels) == len(j_levels) == 6
    for i, (t, j) in enumerate(zip(t_levels, j_levels)):
        t = t.permute(0, 2, 3, 1).numpy()
        assert t.shape == j.shape, (i, t.shape, j.shape)
        np.testing.assert_allclose(
            np.asarray(j), t, atol=5e-4, rtol=1e-3,
            err_msg=f"level {i} mismatch")
