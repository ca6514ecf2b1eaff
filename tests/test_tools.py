"""Importer / deploy / extras / kmeans tests."""

import numpy as np

import jax
import jax.numpy as jnp


def test_t2j_conv_layout():
    from tpucv.ckpt.importer import t2j_conv
    w = np.arange(2 * 3 * 1 * 1).reshape(2, 3, 1, 1).astype(np.float32)
    j = t2j_conv(w)
    assert j.shape == (1, 1, 3, 2)
    assert j[0, 0, 1, 0] == w[0, 1, 0, 0]


def test_convert_conv_bn_roundtrip_numerics():
    """A torch-convention conv+bn must produce identical outputs after
    conversion into a tpucv ConvBnAct."""
    import torch
    import torch.nn as tnn
    from tpucv.ckpt.importer import convert_conv_bn
    from tpucv.nn.blocks import ConvBnAct

    torch.manual_seed(0)
    tconv = tnn.Conv2d(3, 8, 3, 1, 1, bias=False)
    tbn = tnn.BatchNorm2d(8, eps=1e-3, momentum=0.03)
    tbn.running_mean.normal_(); tbn.running_var.uniform_(0.5, 2.0)
    tbn.weight.data.normal_(); tbn.bias.data.normal_()
    tmod = tnn.Sequential()
    tmod.conv, tmod.bn = tconv, tbn
    tmod.eval()

    x = torch.randn(1, 3, 8, 8)
    with torch.no_grad():
        ref = tnn.functional.silu(tbn(tconv(x))).permute(0, 2, 3, 1).numpy()

    sd = {f"m.{k}": v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = {}, {}
    convert_conv_bn(sd, "m", params, stats, ("blk",))
    model = ConvBnAct(8, 3, 1)
    xin = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    init = model.init(jax.random.PRNGKey(0), xin)
    variables = {"params": params["blk"], "batch_stats": stats["blk"]}
    out = model.apply(variables, xin)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_fuse_repconv_matches_training_branches():
    from tpucv.deploy import fuse_repconv_params
    rng = np.random.default_rng(0)
    cin = cout = 4
    dense_k = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    one_k = rng.normal(size=(1, 1, cin, cout)).astype(np.float32)

    def mk_bn():
        return {"scale": rng.normal(size=cout).astype(np.float32),
                "bias": rng.normal(size=cout).astype(np.float32),
                "mean": rng.normal(size=cout).astype(np.float32),
                "var": rng.uniform(0.5, 2.0, cout).astype(np.float32)}

    d_bn, o_bn, i_bn = mk_bn(), mk_bn(), mk_bn()
    k, b = fuse_repconv_params(dense_k, d_bn, one_k, o_bn, i_bn)

    x = jnp.asarray(rng.normal(size=(1, 6, 6, cin)).astype(np.float32))

    def branch(x, kk, bn, pad):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(kk), (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        std = jnp.sqrt(jnp.asarray(bn["var"]) + 1e-3)
        return (y - jnp.asarray(bn["mean"])) / std * jnp.asarray(
            bn["scale"]) + jnp.asarray(bn["bias"])

    ident_k = np.zeros((1, 1, cin, cout), np.float32)
    for i in range(cin):
        ident_k[0, 0, i, i] = 1.0
    ref = (branch(x, dense_k, d_bn, 1) + branch(x, one_k, o_bn, 0)
           + branch(x, ident_k, i_bn, 0))
    fused = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


def test_export_stablehlo_contains_entry():
    from tpucv.deploy import export_stablehlo
    txt = export_stablehlo(lambda x: x * 2 + 1, jnp.zeros((2, 2)))
    assert "stablehlo" in txt or "mhlo" in txt or "func.func" in txt


def test_serialized_export_round_trip():
    """export_serialized bytes rehydrate to a callable producing identical
    outputs — the shippable serving artifact (reference deploy/ is 0 LoC)."""
    from flax import linen as nn
    from tpucv.deploy import export_serialized, load_serialized

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    model = Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 8, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    fn = lambda xx: model.apply(v, xx)
    data = export_serialized(fn, x)
    assert isinstance(data, bytes) and len(data) > 500
    rehydrated = load_serialized(data)
    np.testing.assert_allclose(np.asarray(rehydrated(x)),
                               np.asarray(fn(x)), atol=1e-6)


def test_kmeans_recovers_clusters():
    # load by explicit path: a bare `import scripts.kmeans` can resolve to
    # the reference checkout's scripts/ if a golden test put it on sys.path
    import importlib.util, os
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "kmeans.py")
    spec = importlib.util.spec_from_file_location("tpucv_kmeans", path)
    km = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(km)
    kmeans_anchors, iou_wh = km.kmeans_anchors, km.iou_wh
    rng = np.random.default_rng(0)
    truth = np.array([[10, 10], [50, 100], [200, 150]], np.float32)
    wh = np.concatenate([
        t + rng.normal(0, 0.05 * t.mean(), (200, 2)) for t in truth])
    anchors = kmeans_anchors(wh.astype(np.float32), 3, seed=1)
    best = iou_wh(truth, anchors).max(axis=1)
    assert (best > 0.85).all()


def test_extra_models_forward():
    from tpucv.models.extras import VGG, MobileNetV2, UNet
    x = jnp.zeros((1, 64, 64, 3))
    vgg = VGG(depth=16)
    v = jax.jit(vgg.init)(jax.random.PRNGKey(0), x)
    assert vgg.apply(v, x).shape == (1, 2, 2, 512)
    mb = MobileNetV2(num_classes=10)
    v = jax.jit(mb.init)(jax.random.PRNGKey(0), x)
    assert mb.apply(v, x).shape == (1, 10)
    un = UNet(num_classes=5)
    v = jax.jit(un.init)(jax.random.PRNGKey(0), x)
    assert un.apply(v, x).shape == (1, 64, 64, 5)
