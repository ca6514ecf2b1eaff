"""Golden parity: reference torch SSD300 vs tpucv flax SSD with imported
weights (third model family with full numerical parity)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


def test_golden_ssd_forward_parity():
    sys.modules.setdefault("thop", types.ModuleType("thop"))
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    sys.modules.setdefault("torchvision", tv)
    sys.path.insert(0, REF)
    import torch
    from configs.ssd_cfg import SsdConfig as RefCfg
    from core.models.ssd_model import SSD as RefSSD

    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_ssd, merge_into_variables
    from tpucv.models.ssd import SSD

    rcfg = RefCfg()
    for obj in (rcfg, getattr(rcfg, "train", None), getattr(rcfg, "arch", None)):
        if obj is not None and hasattr(obj, "pretrained"):
            obj.pretrained = False
    torch.manual_seed(0)
    tm = RefSSD(rcfg)
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = SSD(num_classes=21, input_size=300)
    x_np = np.random.default_rng(0).random((1, 300, 300, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, import_ssd(sd))

    # NOTE: the reference flattens its head outputs channel-major WITHOUT a
    # permute (ssd_model.py:184-190), scrambling (prior, coord) groups across
    # spatial positions; tpucv uses the standard per-pixel layout that
    # matches its anchor order. Compare per-level conv outputs with an
    # explicit layout conversion instead of the scrambled concat.
    xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    with torch.no_grad():
        x1, x2 = tm.backbone(xt)
        sources = [tm.l2_norm(x1), x2] + list(tm.extras(x2))
        t_locs = [l(s).permute(0, 2, 3, 1).reshape(1, -1, 4).numpy()
                  for l, s in zip(tm.locs, sources)]
        t_confs = [c(s).permute(0, 2, 3, 1).reshape(1, -1, 21).numpy()
                   for c, s in zip(tm.confs, sources)]
    t_loc = np.concatenate(t_locs, axis=1)
    t_conf = np.concatenate(t_confs, axis=1)

    j_loc, j_conf = model.apply(variables, jnp.asarray(x_np))
    assert j_loc.shape == t_loc.shape
    np.testing.assert_allclose(np.asarray(j_loc), t_loc,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf,
                               atol=5e-4, rtol=1e-3)


def test_ssd300_param_count_exact():
    """Structural exactness: 26,293,934 params, equal to the reference."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as tu
    from tpucv.models.ssd import SSD
    m = SSD(num_classes=21, input_size=300)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    assert sum(x.size for x in tu.tree_leaves(v["params"])) == 26_293_934
