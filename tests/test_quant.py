"""int8 post-training quantization (tpucv/quant.py + ConvBnAct int8 path).

The reference has no quantized deploy path (its deploy stubs are 0 LoC,
SURVEY §1.11); this is a beats-feature, so the tests pin down its own
contract: exactness of the plumbing when quantization is lossless, BN-fold
correctness, skip rules, and end-to-end closeness on a full model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucv import quant
from tpucv.nn.blocks import ConvBnAct, DWConv


def _realistic_convbn_vars(rng, m, x, out_ch, ci, k=3):
    v = jax.device_get(m.init(jax.random.PRNGKey(0), x))
    v["params"]["bn"]["scale"] = rng.uniform(
        0.5, 2, out_ch).astype(np.float32)
    v["params"]["bn"]["bias"] = rng.normal(0, 1, out_ch).astype(np.float32)
    v["batch_stats"]["bn"]["mean"] = rng.normal(
        0, 1, out_ch).astype(np.float32)
    v["batch_stats"]["bn"]["var"] = rng.uniform(
        0.5, 4, out_ch).astype(np.float32)
    v["params"]["conv"]["kernel"] = rng.normal(
        0, 0.3, (k, k, ci, out_ch)).astype(np.float32)
    return v


def test_quant_path_is_exact_when_lossless():
    """Integer-valued inputs/weights with aligned scales quantize without
    rounding, so the int8 path must reproduce the float path bit-for-bit —
    this pins the whole pipeline (scales, folding, bias, conv) with no
    tolerance to hide bugs in."""
    rng = np.random.default_rng(0)
    m = ConvBnAct(8, 3, 1, dtype=jnp.float32)
    x = jnp.asarray(
        rng.integers(-127, 128, (1, 8, 8, 8)).astype(np.float32))
    v = jax.device_get(m.init(jax.random.PRNGKey(0), x))
    kern = rng.integers(-127, 128, (3, 3, 8, 8)).astype(np.float32)
    kern.reshape(-1, 8)[0] = 127  # per-channel max -> wscale = 1
    v["params"]["conv"]["kernel"] = kern
    # BN folds to identity: gamma/sqrt(var+eps) == 1, mean 0, beta 0
    v["params"]["bn"]["scale"] = np.full(8, 1.0, np.float32)
    v["params"]["bn"]["bias"] = np.zeros(8, np.float32)
    v["batch_stats"]["bn"]["mean"] = np.zeros(8, np.float32)
    v["batch_stats"]["bn"]["var"] = np.full(8, 1.0 - 1e-3, np.float32)
    # calibrate with an input whose absmax is exactly 127 -> xscale = 1
    calib = x.at[0, 0, 0, 0].set(127.0)
    qv = quant.quantize_for_inference(m, v, [calib])
    assert quant.count_quantized(qv["quant"]) == 1
    ref = np.asarray(m.apply(v, x), np.float32)
    out = np.asarray(m.apply(qv, x), np.float32)
    np.testing.assert_array_equal(ref, out)


def test_quant_close_on_realistic_convbn():
    rng = np.random.default_rng(1)
    m = ConvBnAct(32, 3, 1, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 16)).astype(np.float32))
    v = _realistic_convbn_vars(rng, m, x, 32, 16)
    qv = quant.quantize_for_inference(m, v, [x])
    ref = np.asarray(m.apply(v, x), np.float32)
    out = np.asarray(m.apply(qv, x), np.float32)
    rel = np.abs(ref - out).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_quant_skips_narrow_and_depthwise():
    """The 3-channel stem and depthwise convs stay float (min_in_ch):
    their per-group input width is MXU-hostile in int8."""
    rng = np.random.default_rng(2)
    m = ConvBnAct(16, 3, 2, dtype=jnp.float32)   # stem-like: ci = 3
    x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    qv = quant.quantize_for_inference(m, v, [x])
    assert quant.count_quantized(qv["quant"]) == 0

    dw = DWConv(16, 3, 1, dtype=jnp.float32)     # per-group width 1
    xd = jnp.asarray(rng.random((1, 16, 16, 16), np.float32))
    vd = dw.init(jax.random.PRNGKey(0), xd)
    qvd = quant.quantize_for_inference(dw, vd, [xd])
    assert quant.count_quantized(qvd["quant"]) == 0


def test_quant_bn_fold_matches_float_pipeline():
    """Dequantized-weight conv must equal conv->BN exactly in f64: isolate
    the fold from the int8 rounding by checking the builder's folded
    kernel/bias against the float pipeline on a delta input."""
    rng = np.random.default_rng(3)
    m = ConvBnAct(8, 1, 1, act=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 8)).astype(np.float32))
    v = _realistic_convbn_vars(rng, m, x, 8, 8, k=1)
    stats = quant.calibrate(m, v, [x])
    entry = quant.build_quant_collection(v, stats)
    w = (np.asarray(entry["conv::qkernel"], np.float64)
         * np.asarray(entry["conv::scale"], np.float64)
         / (float(entry["conv::xscale"])))    # folded kernel, dequantized
    bias = np.asarray(entry["conv::bias"], np.float64)
    # float pipeline: conv (no act) -> BN with running stats
    ref = np.asarray(m.apply(v, x), np.float64)
    man = (np.einsum("bhwc,ijco->bhwo",
                     np.asarray(x, np.float64), w) + bias)
    # the only gap is the int8 rounding of the kernel: <= wscale/2 per tap
    wscale = (np.asarray(entry["conv::scale"], np.float64)
              / float(entry["conv::xscale"]))
    bound = (np.abs(np.asarray(x)).max() * 8 * wscale / 2).max()
    assert np.abs(ref - man).max() <= bound + 1e-4


def test_quantize_full_yolo8_close_and_transparent():
    from tpucv.models.yolov8 import Yolo8

    rng = np.random.default_rng(4)
    m = Yolo8(scale="n", nc=16, reg_max=16, dtype=jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    qv = quant.quantize_for_inference(m, v, [x])
    nq = quant.count_quantized(qv["quant"])
    assert nq > 40, nq                      # whole backbone+neck+head convs
    ref = m.apply(v, x)
    out = m.apply(qv, x)
    for r, o in zip(ref, out):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        denom = np.abs(r).max() + 1e-9
        assert np.abs(r - o).max() / denom < 0.1
    # cosine similarity of the flattened raw maps stays ~1
    rf = np.concatenate([np.asarray(t, np.float32).ravel() for t in ref])
    of = np.concatenate([np.asarray(t, np.float32).ravel() for t in out])
    cos = float((rf * of).sum()
                / (np.linalg.norm(rf) * np.linalg.norm(of) + 1e-9))
    assert cos > 0.999, cos


def test_quantize_variables_harness_integration():
    """algo.quantize_variables produces variables the standard eval path
    accepts unchanged, and the quantized model still detects the synthetic
    rectangles (boxes from float and int8 paths overlap)."""
    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.data.detection_dataset import SyntheticDetectionIndex

    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = 64
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 64
    cfg.decode.max_det = 16
    algo = YOLOv8(cfg)
    algo.nc = 8
    index = SyntheticDetectionIndex(4, 64, 8, max_objects=2, seed=0)
    variables = algo.init_variables(seed=0)
    qv = algo.quantize_variables(variables, index, n_images=4, batch_size=2)
    assert quant.count_quantized(qv["quant"]) > 40
    infer = algo.make_infer_fn(conf_threshold=0.0)
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, 16:48, 16:48] = 200
    bf, sf, cf, vf = jax.device_get(infer(variables, jnp.asarray(img)))
    bq, sq, cq, vq = jax.device_get(infer(qv, jnp.asarray(img)))
    # raw-weight net: don't assert detections, assert the two paths rank
    # the same top candidate and score it nearly identically
    assert abs(float(sf[0, 0]) - float(sq[0, 0])) < 0.05


def test_quantize_refuses_models_without_int8_coverage():
    """A model with no quantization hooks sows nothing during calibration;
    quantize_variables must raise instead of silently attaching an empty
    quant collection and reporting float results as int8."""
    from flax import linen as nn

    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.data.detection_dataset import SyntheticDetectionIndex

    class PlainConvNet(nn.Module):      # no sow_calibration anywhere
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Conv(8, (3, 3), padding="SAME")(x)

    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = 64
    cfg.train.mixed_precision = False
    algo = YOLOv8(cfg)
    algo.nc = 8
    algo.build_model = lambda: PlainConvNet()
    variables = algo.init_variables(seed=0)
    index = SyntheticDetectionIndex(2, 64, 8, max_objects=1, seed=0)
    with pytest.raises(ValueError, match="no quantizable convs"):
        algo.quantize_variables(variables, index, n_images=1, batch_size=1)


def test_quant_composes_with_bf16_compute_dtype():
    """Production models run dtype=bf16; the int8 path quantizes the bf16
    activations through f32 and dequantizes back to bf16, staying close to
    the bf16 float path."""
    rng = np.random.default_rng(7)
    m = ConvBnAct(32, 3, 1, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 16)).astype(np.float32))
    v = _realistic_convbn_vars(rng, m, x, 32, 16)
    xb = x.astype(jnp.bfloat16)
    qv = quant.quantize_for_inference(m, v, [xb])
    assert quant.count_quantized(qv["quant"]) == 1
    ref = np.asarray(m.apply(v, xb), np.float32)
    out = np.asarray(m.apply(qv, xb), np.float32)
    assert out.dtype == np.float32 and m.apply(qv, xb).dtype == jnp.bfloat16
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_quant_collection_checkpoint_roundtrip(tmp_path):
    """A quantized bundle must save/load like any variables dict (deploy
    workflow: calibrate once, ship the int8 ckpt)."""
    from tpucv.ckpt.checkpoint import CheckPoint

    rng = np.random.default_rng(6)
    m = ConvBnAct(8, 3, 1, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    v = _realistic_convbn_vars(rng, m, x, 8, 8)
    qv = quant.quantize_for_inference(m, v, [x])
    path = CheckPoint.save_pure(qv, str(tmp_path / "q.ckpt"))
    restored = CheckPoint.load_pure(path, jax.tree.map(jnp.zeros_like, qv))
    assert restored["quant"]["conv::qkernel"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(m.apply(qv, x)),
                                  np.asarray(m.apply(restored, x)))
    # the CLI path: init-variables template has NO quant collection, but
    # the saved bundle's must ride along (predict --ckpt int8_bundle)
    tmpl = {"params": jax.tree.map(jnp.zeros_like, v["params"]),
            "batch_stats": jax.tree.map(jnp.zeros_like, v["batch_stats"])}
    restored2 = CheckPoint.load_pure(path, tmpl)
    assert "quant" in restored2
    assert np.asarray(restored2["quant"]["conv::qkernel"]).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(m.apply(qv, x)),
                                  np.asarray(m.apply(restored2, x)))


def test_quantized_export_round_trip():
    """The serving artifact (jax.export, deploy.py) must ship the int8 path
    too: quantized variables bake into the exported StableHLO unchanged."""
    from tpucv.deploy import export_serialized, load_serialized

    rng = np.random.default_rng(5)
    m = ConvBnAct(8, 3, 1, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    v = _realistic_convbn_vars(rng, m, x, 8, 8)
    qv = quant.quantize_for_inference(m, v, [x])
    assert quant.count_quantized(qv["quant"]) == 1
    fn = lambda xx: m.apply(qv, xx)   # noqa: E731
    data = export_serialized(fn, x)
    rehydrated = load_serialized(data)
    np.testing.assert_allclose(np.asarray(rehydrated(x)),
                               np.asarray(fn(x)), atol=1e-6)


def _randomize_bn(tree_p, tree_b, rng):
    """Give every BN in a params/batch_stats tree non-degenerate stats so
    quantization error is visible (fresh init is mean=0/var=1 everywhere)."""
    def walk(p, b):
        for k in list(p.keys()):
            if k.endswith("bn") or k == "bn":
                co = p[k]["scale"].shape[0]
                p[k]["scale"] = rng.uniform(0.5, 2, co).astype(np.float32)
                p[k]["bias"] = rng.normal(0, 0.5, co).astype(np.float32)
                if isinstance(b, dict) and k in b:
                    b[k]["mean"] = rng.normal(0, 0.5, co).astype(np.float32)
                    b[k]["var"] = rng.uniform(0.5, 2, co).astype(np.float32)
            elif isinstance(p[k], dict):
                walk(p[k], b.get(k, {}) if isinstance(b, dict) else {})
    walk(tree_p, tree_b)


def test_quantize_bnconv_and_centernet_blocks_close():
    """The int8 hook generalizes beyond ConvBnAct: ResNet/DeepLab's BNConv
    (eps 1e-5, ReLU) and CenterNet's ConvBNReLU / BasicBlock (inline
    cv2_conv+cv2_bn pair) / Root (pre-residual fold) all quantize close to
    their float paths."""
    from tpucv.models.centernet import BasicBlock, ConvBNReLU, Root
    from tpucv.models.resnet import BNConv

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1.5, (2, 12, 12, 16)).astype(np.float32))

    for make, args in [
        (BNConv, (x,)),
        (ConvBNReLU, (x,)),
        (BasicBlock, (x,)),
        (Root, ([x, x],)),
    ]:
        m = make(16, dtype=jnp.float32)
        v = jax.device_get(jax.jit(m.init)(jax.random.PRNGKey(0), *args))
        _randomize_bn(v["params"], v["batch_stats"], rng)
        qv = quant.quantize_for_inference(m, v, [args[0]] if make is not Root
                                          else [[x, x]])
        nq = quant.count_quantized(qv["quant"])
        assert nq >= 1, (make.__name__, nq)
        ref = np.asarray(m.apply(v, *args), np.float32)
        out = np.asarray(m.apply(qv, *args), np.float32)
        rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.06, (make.__name__, rel)
        # sanity: the int8 path is actually live (zeroed kernels change it)
        sab = jax.tree.map(
            lambda a: jnp.zeros_like(a) if a.dtype == jnp.int8 else a,
            qv["quant"])
        out2 = np.asarray(m.apply(dict(qv, quant=sab), *args), np.float32)
        assert np.abs(out - out2).max() > 0


def test_quantize_biased_conv_without_bn():
    """conv_biased (SSD conv6/conv7, CenterNet head necks): no BN to fold;
    the conv bias passes straight into the dequant epilogue."""
    from flax import linen as nn

    from tpucv.quant import conv_biased

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return conv_biased(self, x, features=8, kernel=3, padding=1,
                               conv="c6", dtype=jnp.float32, train=train)

    rng = np.random.default_rng(13)
    m = Plain()
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    v = jax.device_get(m.init(jax.random.PRNGKey(0), x))
    v["params"]["c6"]["kernel"] = rng.normal(
        0, 0.3, (3, 3, 8, 8)).astype(np.float32)
    v["params"]["c6"]["bias"] = rng.normal(0, 1, 8).astype(np.float32)
    qv = quant.quantize_for_inference(m, v, [x])
    assert quant.count_quantized(qv["quant"]) == 1
    ref = np.asarray(m.apply(v, x), np.float32)
    out = np.asarray(m.apply(qv, x), np.float32)
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_folds_conv_bias():
    """SSD's VGG convs carry a bias AND BN; the fold must include it:
    bias_total = beta + (conv_bias - mean) * gamma/sqrt(var+eps)."""
    from flax import linen as nn

    class BiasedConvBN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            from tpucv import quant as q

            if not train:
                q.sow_calibration(self, x, conv="c", bn="b", eps=1e-5)
                y = q.quantized_conv(self, x, conv="c",
                                     padding=((1, 1), (1, 1)),
                                     out_dtype=jnp.float32)
                if y is not None:
                    return y
            x = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                        name="c")(x)
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=1e-5, name="b")(x)

    rng = np.random.default_rng(10)
    m = BiasedConvBN()
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    v = jax.device_get(m.init(jax.random.PRNGKey(0), x))
    v["params"]["c"]["bias"] = rng.normal(0, 1, 8).astype(np.float32)
    _randomize_bn({"b": v["params"]["b"]}, {"b": v["batch_stats"]["b"]}, rng)
    v["batch_stats"]["b"]["mean"] = rng.normal(0, 1, 8).astype(np.float32)
    qv = quant.quantize_for_inference(m, v, [x])
    ref = np.asarray(m.apply(v, x), np.float32)
    out = np.asarray(m.apply(qv, x), np.float32)
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_quantize_ssd_and_centernet_models():
    """Model-level coverage for the non-YOLO families: SSD300 (VGG16-BN,
    biased convs) and CenterNet DLA-34 quantize with sensible conv counts
    and stay close to float."""
    from tpucv.models.centernet import CenterNet
    from tpucv.models.ssd import SSD

    rng = np.random.default_rng(11)

    m = SSD(num_classes=21, input_size=300, dtype=jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    x = jnp.asarray(rng.random((1, 300, 300, 3), np.float32))
    qv = quant.quantize_for_inference(m, v, [x])
    nq = quant.count_quantized(qv["quant"])
    # 13 VGG convs minus the 3-ch stem, + biased no-BN conv6/conv7
    assert nq == 14, nq
    for r, o in zip(m.apply(v, x), m.apply(qv, x)):
        r, o = np.asarray(r, np.float32), np.asarray(o, np.float32)
        assert np.abs(r - o).max() / (np.abs(r).max() + 1e-9) < 0.1

    m2 = CenterNet(num_classes=4, dtype=jnp.float32)
    v2 = jax.jit(m2.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x2 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    qv2 = quant.quantize_for_inference(m2, v2, [x2])
    nq2 = quant.count_quantized(qv2["quant"])
    assert nq2 > 20, nq2
    r = np.asarray(m2.apply(v2, x2), np.float32)
    o = np.asarray(m2.apply(qv2, x2), np.float32)
    assert np.abs(r - o).max() / (np.abs(r).max() + 1e-9) < 0.15


@pytest.mark.slow
def test_quantize_deeplab_via_algo():
    """DeepLab quantizes through BNConv and its algo-level calibration
    entry point (resize + imagenet-normalize path)."""
    from tpucv.algorithms.segmentation_2d import DeeplabV3PlusA
    from tpucv.configs.model_cfgs import DeeplabV3PlusConfig

    rng = np.random.default_rng(12)
    cfg = DeeplabV3PlusConfig()
    cfg.arch.backbone = "resnet50"
    cfg.arch.crop_size = 65
    cfg.dataset.input_size = 65
    cfg.train.mixed_precision = False
    algo = DeeplabV3PlusA(cfg)
    variables = algo.init_variables(seed=0)
    index = [rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
             for _ in range(2)]
    qv = algo.quantize_variables(variables, index, n_images=2, batch_size=2)
    assert quant.count_quantized(qv["quant"]) > 30
    # logits stay close through ~60 quantized convs + ASPP + decoder
    model = algo.build_model()
    x = jnp.asarray(rng.random((1, 65, 65, 3), np.float32))
    r = np.asarray(model.apply(variables, x), np.float32)
    o = np.asarray(model.apply(qv, x), np.float32)
    assert np.abs(r - o).max() / (np.abs(r).max() + 1e-9) < 0.15


@pytest.mark.slow
def test_quantize_yolov7_close():
    """YOLOv7's ConvBnAct stacks (E-ELAN, Transition, SPPCSPC) quantize
    through the same hook; RepConv and the raw head convs stay float."""
    from tpucv.models.yolov7 import Yolo7

    rng = np.random.default_rng(8)
    m = Yolo7(nc=8, dtype=jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    qv = quant.quantize_for_inference(m, v, [x])
    nq = quant.count_quantized(qv["quant"])
    assert nq > 30, nq
    ref = m.apply(v, x)
    out = m.apply(qv, x)
    for r, o in zip(ref, out):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        assert np.abs(r - o).max() / (np.abs(r).max() + 1e-9) < 0.1


@pytest.mark.slow
def test_quantized_map_close_to_float_on_trained_weights():
    """End-to-end accuracy guard: briefly train YOLOv8n on synthetic data
    (CPU, small), then compare float vs int8 mAP@0.5 through the full eval
    harness. int8 must stay within a few points."""
    import optax

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.data.detection_dataset import (DetectionDataset,
                                              SyntheticDetectionIndex)
    from tpucv.data.loader import Loader
    from tpucv.losses.yolov8 import yolov8_loss
    from tpucv.models.yolov8 import Yolo8
    from tpucv.ops.preprocess import normalize_images
    from tpucv.train.state import TrainState, make_train_step

    from tpucv.train.schedules import warmup_multistep

    nc, S, B, STEPS = 4, 96, 8, 250
    model = Yolo8(scale="n", nc=nc, dtype=jnp.float32)
    variables = init_on_cpu(model, (1, S, S, 3), jnp.float32)
    train_idx = SyntheticDetectionIndex(16, S, nc, max_objects=2, seed=0)
    val_idx = SyntheticDetectionIndex(8, S, nc, max_objects=2, seed=1)
    ds = DetectionDataset(train_idx, S, max_boxes=4, train=True,
                          mosaic_prob=0.0)
    loader = Loader(ds, B, shuffle=True)
    tx = optax.adam(warmup_multistep(2e-3, 50, [10**9]))

    def loss_fn(raw, batch):
        return yolov8_loss(raw, batch["gt_labels"], batch["gt_bboxes"],
                           batch["gt_mask"], nc=nc)

    step = make_train_step(model.apply, loss_fn, tx, donate=False)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx)
    n = 0
    while n < STEPS:
        loader.set_epoch(n)
        for batch in loader:
            db = {"images": normalize_images(
                      jnp.asarray(batch["images"]), jnp.float32),
                  "gt_labels": jnp.asarray(batch["gt_labels"]),
                  "gt_bboxes": jnp.asarray(batch["gt_bboxes"]),
                  "gt_mask": jnp.asarray(batch["gt_mask"])}
            state, _ = step(state, db)
            n += 1
            if n >= STEPS:
                break

    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = S
    cfg.dataset.name = "voc"
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 128
    cfg.decode.max_det = 32
    algo = YOLOv8(cfg)
    algo.nc = nc
    algo.class_names = [f"c{i}" for i in range(nc)]
    fv = {"params": state.params, "batch_stats": state.batch_stats}
    res_f = algo.evaluate_on_voc(fv, val_idx, batch_size=4,
                                 conf_threshold=0.05, verbose=False)
    qv = algo.quantize_variables(fv, val_idx, n_images=8, batch_size=4)
    res_q = algo.evaluate_on_voc(qv, val_idx, batch_size=4,
                                 conf_threshold=0.05, verbose=False)
    print(f"float mAP50={res_f['mAP']:.4f}  int8 mAP50={res_q['mAP']:.4f}")
    # the guard is only meaningful if the float model actually detects:
    # without this floor a broken training recipe makes 0-vs-0 pass
    assert res_f["mAP"] > 0.15, res_f["mAP"]
    assert res_q["mAP"] >= res_f["mAP"] - 0.05, (res_f["mAP"], res_q["mAP"])
