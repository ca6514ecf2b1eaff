"""DeepLabV3+ / ResNet / seg loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucv.losses.segmentation import cross_entropy_loss, focal_loss
from tpucv.models.deeplabv3plus import DeeplabV3Plus
from tpucv.models.resnet import resnet50


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def test_resnet_feature_strides():
    model = resnet50(output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = model.apply(vars_, x)
    assert feats["low_level"].shape == (1, 16, 16, 256)   # stride 4
    assert feats["out"].shape == (1, 4, 4, 2048)           # stride 16


def test_deeplab_output_shape():
    model = DeeplabV3Plus(num_classes=21, backbone="resnet50")
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 65, 65, 21)


def test_ce_loss_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.array([[[0, 255], [255, 255]]])
    loss, _ = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)


def test_focal_less_than_ce_for_easy_examples():
    logits = jnp.zeros((1, 4, 4, 3)).at[..., 1].set(5.0)
    labels = jnp.ones((1, 4, 4), jnp.int32)
    ce, _ = cross_entropy_loss(logits, labels)
    fo, _ = focal_loss(logits, labels, alpha=1.0)
    assert float(fo) < float(ce)


def test_loss_gradients_flow():
    model = DeeplabV3Plus(num_classes=4, backbone="resnet50")
    x = jnp.ones((1, 33, 33, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    labels = jnp.zeros((1, 33, 33), jnp.int32)

    def f(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        loss, _ = cross_entropy_loss(out, labels)
        return loss

    g = jax.grad(f)(vars_["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
