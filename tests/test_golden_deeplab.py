"""Golden parity: reference DeeplabV3Plus (ResNet-101 + ASPP + decoder) vs
tpucv DeeplabV3Plus with imported weights (VERDICT round 1, item 7).
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


@pytest.fixture(scope="module")
def ref_deeplab():
    import torch
    from core.models.deeplabv3plus import DeeplabV3Plus as RefDeeplab

    torch.manual_seed(0)
    m = RefDeeplab(num_classes=21, output_stride=16,
                   pretrained_backbone=False)
    m.eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    return m


def test_golden_deeplab_forward(ref_deeplab):
    import torch
    import jax
    import jax.numpy as jnp
    from tpucv.ckpt.importer import import_deeplab, merge_into_variables
    from tpucv.models.deeplabv3plus import DeeplabV3Plus

    tm = ref_deeplab
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = DeeplabV3Plus(num_classes=21, backbone="resnet101",
                          output_stride=16)
    x_np = np.random.default_rng(0).random((1, 129, 129, 3)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    imported = import_deeplab(sd)

    def count(t):
        return sum(count(v) for v in t.values()) if isinstance(t, dict) else 1
    assert count(imported["params"]) == count(init_vars["params"]), (
        count(imported["params"]), count(init_vars["params"]))

    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, imported)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    t_out = t_out.permute(0, 2, 3, 1).numpy()
    j_out = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    assert j_out.shape == t_out.shape == (1, 129, 129, 21)
    # output magnitudes are ~1e4 with randomised BN stats; atol=0.5 is a
    # ~3e-5 relative bound — fp accumulation over 101 layers + bilinear
    # resizes (measured max abs diff 0.14)
    np.testing.assert_allclose(j_out, t_out, atol=0.5, rtol=1e-3)


def test_deeplab_param_count_matches_reference(ref_deeplab):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as tu
    from tpucv.models.deeplabv3plus import DeeplabV3Plus

    tm = ref_deeplab
    t_count = sum(p.numel() for p in tm.parameters())
    model = DeeplabV3Plus(num_classes=21, backbone="resnet101",
                          output_stride=16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3)))
    j_count = sum(x.size for x in tu.tree_leaves(v["params"]))
    assert j_count == t_count, (j_count, t_count)
