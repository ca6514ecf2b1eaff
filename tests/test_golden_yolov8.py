"""Golden parity: reference torch YOLOv8 vs tpucv flax YOLOv8.

Loads the PyTorch reference implementation read-only from /root/reference,
initialises it with torch's init, imports its state_dict through
``tpucv.ckpt.importer.import_yolov8``, and compares raw head outputs — the
layerwise-fidelity check SURVEY §4/§7.3(7) calls non-negotiable (BN eps 1e-3,
SiLU, pad conventions, channel math all have to line up for this to pass).

Skipped when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


@pytest.fixture(scope="module")
def torch_ref_model():
    for name in ("thop", "torchvision"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, REF)
    import torch
    from core.models.yolov8.yolo_v8 import get_yolo8_n

    torch.manual_seed(0)
    m = get_yolo8_n(nc=80)
    m.eval()
    return m


def test_golden_forward_parity(torch_ref_model):
    import torch
    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_yolov8, merge_into_variables
    from tpucv.models.yolov8 import Yolo8

    tm = torch_ref_model
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = Yolo8(scale="n", nc=80)
    x_np = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    imported = import_yolov8(sd)
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, imported)

    # torch reference in train mode returns the raw per-level maps, matching
    # our always-raw forward (reference modules.py:432-433); but its BN then
    # uses batch stats — so run it in eval mode and read the Detect input
    # branches instead: easiest faithful comparison is train-mode maps with
    # BN in eval. The reference Detect returns raw maps when
    # self.training=True, so flip only the top-level training flag.
    tm.apply(lambda mod: mod.eval())
    for mod in tm.modules():
        mod.training = True          # Detect returns raw maps
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.training = False     # ...but BN uses running stats
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    t_maps = [o.permute(0, 2, 3, 1).numpy() for o in t_out]

    j_maps = model.apply(variables, jnp.asarray(x_np))
    assert len(t_maps) == len(j_maps)
    for i, (t, j) in enumerate(zip(t_maps, j_maps)):
        assert t.shape == j.shape, (i, t.shape, j.shape)
        np.testing.assert_allclose(
            np.asarray(j), t, atol=2e-4, rtol=1e-3,
            err_msg=f"level {i} mismatch")


def test_golden_decoded_boxes_parity(torch_ref_model):
    """Decode parity: our DFL+dist2bbox on imported weights vs the torch
    eval-mode decoded output (B, 4+nc, A)."""
    import torch
    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_yolov8, merge_into_variables
    from tpucv.decode.yolov8 import raw_to_pred
    from tpucv.models.yolov8 import Yolo8

    tm = torch_ref_model
    for mod in tm.modules():
        mod.training = False
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = Yolo8(scale="n", nc=80)
    x_np = np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, import_yolov8(sd))

    with torch.no_grad():
        y, _ = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    t_pred = y.numpy()                       # (1, 4+nc, A) xywh + sigmoid cls

    raw = model.apply(variables, jnp.asarray(x_np))
    j_pred = np.asarray(raw_to_pred(raw, 80, 16, (8, 16, 32)))  # (1, A, 4+nc)
    np.testing.assert_allclose(
        j_pred.transpose(0, 2, 1), t_pred, atol=2e-4, rtol=1e-3)
