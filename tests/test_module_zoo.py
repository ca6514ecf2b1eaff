"""Forward-shape tests for the complete block/head zoo (inventory parity with
reference core/models/yolov8/modules.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucv.nn.blocks import (
    C1, C2, C3, C3Ghost, C3TR, C3x, CBAM, BottleneckCSP, ConvTransposeBnAct,
    DWConvTranspose2d, Ensemble, Focus, GhostBottleneck, GhostConv, Proto,
    SPP, TransformerBlock)
from tpucv.nn.heads import ClassifyHead, PoseHead, SegmentHead
from tpucv.ops.masks import crop_mask, process_mask


X = jnp.zeros((1, 16, 16, 32))


pytestmark = pytest.mark.slow  # heavy: full-model compiles

@pytest.mark.parametrize("mod,out_ch", [
    (C1(24, 2), 24),
    (C2(24, 2), 24),
    (C3(24, 2), 24),
    (C3x(24, 2), 24),
    (C3TR(24, 2), 24),
    (C3Ghost(24, 2), 24),
    (BottleneckCSP(24, 2), 24),
    (GhostConv(24), 24),
    (GhostBottleneck(32), 32),
    (SPP(24), 24),
    (TransformerBlock(32, 4, 1), 32),
])
def test_block_shapes(mod, out_ch):
    v = mod.init(jax.random.PRNGKey(0), X)
    y = mod.apply(v, X)
    assert y.shape == (1, 16, 16, out_ch)


def test_cbam_preserves_shape():
    m = CBAM()
    v = m.init(jax.random.PRNGKey(0), X)
    assert m.apply(v, X).shape == X.shape


def test_focus_downsamples():
    m = Focus(24)
    v = m.init(jax.random.PRNGKey(0), X)
    assert m.apply(v, X).shape == (1, 8, 8, 24)


def test_conv_transpose_upsamples():
    m = ConvTransposeBnAct(16)
    v = m.init(jax.random.PRNGKey(0), X)
    assert m.apply(v, X).shape == (1, 32, 32, 16)


def test_dw_conv_transpose_matches_torch():
    """DWConvTranspose2d ≡ torch nn.ConvTranspose2d(groups=gcd) numerically
    (reference modules.py:43-48), incl. stride/padding/output-padding."""
    import torch

    c1, c2, k, s, p1, p2 = 8, 12, 3, 2, 1, 1
    g = 4  # gcd(8, 12)
    tm = torch.nn.ConvTranspose2d(c1, c2, k, s, p1, p2, groups=g)
    x = np.random.default_rng(0).standard_normal((2, 6, 5, c1)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    m = DWConvTranspose2d(c2, k, s, p1, p2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch weight (c1, c2/g, k, k) -> HWIO grouped (k, k, c1/g, c2)
    w = tm.weight.detach().numpy().reshape(g, c1 // g, c2 // g, k, k)
    w = w.transpose(3, 4, 1, 0, 2).reshape(k, k, c1 // g, c2)
    v = {"params": {"kernel": jnp.asarray(w),
                    "bias": jnp.asarray(tm.bias.detach().numpy())}}
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_ensemble_concatenates_candidates():
    a = lambda v, x: jnp.ones((2, 5, 6)) * v
    ens = Ensemble([(a, 1.0), (a, 2.0)])
    out = ens(jnp.zeros((2, 3, 3, 3)))
    assert out.shape == (2, 10, 6)
    assert float(out[0, 0, 0]) == 1.0 and float(out[0, 7, 0]) == 2.0


def test_proto_upsamples():
    m = Proto(64, 32)
    v = m.init(jax.random.PRNGKey(0), X)
    assert m.apply(v, X).shape == (1, 32, 32, 32)


def _pyramid():
    return (jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 128)),
            jnp.zeros((1, 2, 2, 256)))


def test_segment_head():
    m = SegmentHead(nc=5, n_masks=8)
    feats = _pyramid()
    v = m.init(jax.random.PRNGKey(0), feats)
    det, coefs, protos = m.apply(v, feats)
    assert det[0].shape == (1, 8, 8, 64 + 5)
    assert coefs[0].shape == (1, 8, 8, 8)
    assert protos.shape == (1, 16, 16, 8)


def test_pose_head():
    m = PoseHead(nc=1, kpt_shape=(17, 3))
    feats = _pyramid()
    v = m.init(jax.random.PRNGKey(0), feats)
    det, kpts = m.apply(v, feats)
    assert kpts[0].shape == (1, 8, 8, 51)


def test_classify_head():
    m = ClassifyHead(nc=10, mid_ch=64)
    v = m.init(jax.random.PRNGKey(0), X)
    assert m.apply(v, X).shape == (1, 10)


def test_crop_mask():
    masks = jnp.ones((1, 8, 8))
    boxes = jnp.array([[2.0, 2.0, 6.0, 6.0]])
    out = crop_mask(masks, boxes)
    assert float(out.sum()) == 16.0
    assert float(out[0, 0, 0]) == 0.0


def test_process_mask_shapes():
    protos = jnp.ones((8, 8, 4))
    coefs = jnp.ones((2, 4))
    boxes = jnp.array([[0.0, 0, 16, 16], [8.0, 8, 32, 32]])
    out = process_mask(protos, coefs, boxes, (32, 32), upsample=True)
    assert out.shape == (2, 32, 32)


def test_legacy_yolo3_trainer_one_step(tmp_path):
    from tpucv.configs.model_cfgs import Yolo3Config
    from tpucv.trainer.yolov3_train import Yolo3Trainer
    cfg = Yolo3Config()
    cfg.dataset.input_size = 64
    cfg.dataset.max_num_boxes = 4
    cfg.train.batch_size = 2
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1000
    cfg.train.save_interval = 1000
    cfg.train.mixed_precision = False
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    state = Yolo3Trainer(cfg).train(max_steps=1)
    assert int(state.step) == 1
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
