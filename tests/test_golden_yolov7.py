"""Golden parity: reference torch YOLOv7-l vs tpucv flax YOLOv7 with imported
weights (second model family with full numerical parity; skipped when the
reference checkout is absent)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


def test_golden_yolov7_forward_parity():
    for name in ("thop", "torchvision"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, REF)
    import torch
    from configs.yolo7_cfg import Yolo7Config as RefCfg
    from core.models.yolov7_model import Yolo7 as RefYolo7

    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_yolov7, merge_into_variables
    from tpucv.models.yolov7 import Yolo7

    rcfg = RefCfg()
    for obj in (rcfg, getattr(rcfg, "train", None), getattr(rcfg, "arch", None)):
        if obj is not None and hasattr(obj, "pretrained"):
            obj.pretrained = False
    torch.manual_seed(0)
    tm = RefYolo7(rcfg)
    tm.eval()
    # randomise BN stats so eval-mode normalisation is non-trivial
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = Yolo7(nc=20, phi="l")
    x_np = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, import_yolov7(sd))

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    # reference returns (P5, P4, P3); tpucv returns (P3, P4, P5)
    t_maps = [o.permute(0, 2, 3, 1).numpy() for o in reversed(t_out)]
    j_maps = model.apply(variables, jnp.asarray(x_np))
    for i, (t, j) in enumerate(zip(t_maps, j_maps)):
        assert t.shape == j.shape, (i, t.shape, j.shape)
        np.testing.assert_allclose(
            np.asarray(j), t, atol=5e-4, rtol=1e-3,
            err_msg=f"level {i} mismatch")
