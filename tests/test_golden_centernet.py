"""Golden parity: full reference CenterNet (DLA-34 + DLAUp/IDAUp grouped-
ConvTranspose pyramid + heads) vs tpucv CenterNet with imported weights.

Complements test_golden_dla.py (backbone-only): this covers the upsampling
pyramid that round 1 had substituted with resize+conv, now implemented
faithfully (VERDICT round 1, item 6).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    from test_golden_losses import install_reference_stubs
    install_reference_stubs()
    yield


def test_depthwise_up_matches_torch_convtranspose():
    """DepthwiseUp == torch ConvTranspose2d(k=2f, s=f, p=f//2, groups=C)."""
    import torch
    import jax
    import jax.numpy as jnp
    from tpucv.models.centernet import DepthwiseUp

    rng = np.random.default_rng(0)
    for f, C, H in ((2, 8, 7), (4, 5, 5)):
        x = rng.normal(size=(2, H, H, C)).astype(np.float32)
        t_up = torch.nn.ConvTranspose2d(C, C, kernel_size=2 * f, stride=f,
                                        padding=f // 2, groups=C, bias=False)
        with torch.no_grad():
            t_up.weight.normal_()
        t_out = t_up(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach()
        t_out = t_out.permute(0, 2, 3, 1).numpy()

        m = DepthwiseUp(ch=C, f=f)
        w_t = t_up.weight.detach().numpy()            # (C, 1, k, k)
        variables = {"params": {"kernel": jnp.asarray(
            np.transpose(w_t, (2, 3, 1, 0)))}}
        j_out = np.asarray(m.apply(variables, jnp.asarray(x)))
        assert j_out.shape == t_out.shape, (j_out.shape, t_out.shape)
        np.testing.assert_allclose(j_out, t_out, atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def ref_centernet():
    import torch
    from core.models.centernet_model import CenterNet as RefCenterNet
    from configs import CenternetConfig

    torch.manual_seed(0)
    cfg = CenternetConfig()
    m = RefCenterNet(cfg)
    m.eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    return m, cfg


def test_golden_centernet_full_forward(ref_centernet):
    import torch
    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_centernet, merge_into_variables
    from tpucv.models.centernet import CenterNet

    tm, cfg = ref_centernet
    nc = cfg.dataset.num_classes
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = CenterNet(num_classes=nc, head_channels=256)
    x_np = np.random.default_rng(1).random((1, 128, 128, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    imported = import_centernet(sd)

    # every imported leaf must land on an init leaf (no silent drops)
    def count(t):
        return sum(count(v) for v in t.values()) if isinstance(t, dict) else 1
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, imported)
    assert count(imported["params"]) == count(init_vars["params"]), (
        count(imported["params"]), count(init_vars["params"]))

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    assert j_out.shape == t_out.shape == (1, 32, 32, nc + 4)
    np.testing.assert_allclose(j_out, t_out, atol=1e-3, rtol=1e-3)


def test_centernet_param_count_matches_reference(ref_centernet):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as tu
    from tpucv.models.centernet import CenterNet

    tm, cfg = ref_centernet
    # exclude the reference DLA's dead ImageNet classifier (base.final:
    # 512*1000+1000 params, unused by the return_levels forward,
    # centernet_model.py:178-222)
    t_count = sum(p.numel() for n, p in tm.named_parameters()
                  if ".final." not in n)
    model = CenterNet(num_classes=cfg.dataset.num_classes, head_channels=256)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    j_count = sum(x.size for x in tu.tree_leaves(v["params"]))
    assert j_count == t_count, (j_count, t_count)
