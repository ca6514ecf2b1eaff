"""Checkpoint backends: msgpack CheckPoint and Orbax manager roundtrips,
plus EMA tracking in TrainState."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpucv.ckpt.checkpoint import CheckPoint
from tpucv.train.state import TrainState, make_train_step


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def _tiny_state():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.adam(1e-2)
    return TrainState.create(params, {}, tx), tx


def test_checkpoint_roundtrip(tmp_path):
    state, _ = _tiny_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "s.ckpt")
    CheckPoint.save(state, p)
    restored = CheckPoint.load(p, _tiny_state()[0])
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.ones((4, 4)))


def test_orbax_roundtrip(tmp_path):
    from tpucv.ckpt.orbax_io import OrbaxCheckPoint
    state, _ = _tiny_state()
    mgr = OrbaxCheckPoint(str(tmp_path / "orbax"), max_to_keep=2)
    mgr.save({"params": jax.device_get(state.params)}, step=1)
    mgr.save({"params": jax.device_get(state.params)}, step=2)
    assert mgr.latest_step() == 2
    out = mgr.load(2, {"params": jax.device_get(state.params)})
    np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                               np.ones((4, 4)))
    mgr.close()


def test_ema_updates():
    params = {"w": jnp.zeros((2,))}
    tx = optax.sgd(1.0)
    state = TrainState.create(params, {}, tx, use_ema=True)

    def apply_fn(variables, x, train=False, mutable=None, rngs=None):
        out = x * variables["params"]["w"].sum()
        return (out, {"batch_stats": {}}) if mutable else out

    def loss_fn(raw, batch):
        return ((raw - 1.0) ** 2).mean(), {}

    step = make_train_step(apply_fn, loss_fn, tx, ema_decay=0.9, donate=False)
    batch = {"images": jnp.ones((2,))}
    s1, _ = step(state, batch)
    # params moved; ema lags behind
    assert float(jnp.abs(s1.params["w"]).sum()) > 0
    assert float(jnp.abs(s1.ema_params["w"]).sum()) < \
        float(jnp.abs(s1.params["w"]).sum())


def test_load_pretrained_partial_shape_matched(tmp_path):
    """load_pretrained overlays matching leaves, keeps init for mismatched
    or missing ones (reference ckpt.py:19-36 semantics)."""
    from tpucv.ckpt.checkpoint import load_pretrained

    init = {
        "params": {"backbone": {"w": jnp.zeros((4, 4))},
                   "head": {"w": jnp.zeros((2, 3))}},
        "batch_stats": {"backbone": {"mean": jnp.zeros((4,))}},
    }
    saved = {
        "params": {"backbone": {"w": np.ones((4, 4), np.float32)},
                   "head": {"w": np.ones((9, 9), np.float32)}},  # mismatch
        "batch_stats": {"backbone": {"mean": np.full((4,), 2.0, np.float32)}},
    }
    p = str(tmp_path / "pre.ckpt")
    CheckPoint.save_pure(saved, p)
    out = load_pretrained(init, p)
    np.testing.assert_allclose(np.asarray(out["params"]["backbone"]["w"]),
                               np.ones((4, 4)))
    np.testing.assert_allclose(np.asarray(out["params"]["head"]["w"]),
                               np.zeros((2, 3)))  # mismatched -> init kept
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["backbone"]["mean"]), 2.0)


def test_trainer_consumes_pretrained_weights(tmp_path, monkeypatch):
    """cfg.train.pretrained_weights is consumed by initialize_model."""
    from tpucv.builder import export_from_registry
    from tpucv.trainer.yolo8_train import Yolo8Trainer

    cfg, _, _ = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 64
    cfg.train.batch_size = 2
    cfg.dataset.max_num_boxes = 4

    # build once to harvest an init tree, save a doctored copy
    t0 = Yolo8Trainer(cfg)
    vars0 = {"params": t0.init_params, "batch_stats": t0.init_batch_stats}
    doctored = jax.tree.map(lambda x: np.full_like(np.asarray(x), 0.123),
                            vars0)
    p = str(tmp_path / "pre.ckpt")
    CheckPoint.save_pure(doctored, p)

    cfg.train.pretrained_weights = p
    t1 = Yolo8Trainer(cfg)
    leaf = np.asarray(jax.tree.leaves(t1.init_params)[0])
    np.testing.assert_allclose(leaf, 0.123, atol=1e-6)


def test_load_pretrained_bare_params_pytree(tmp_path):
    """A msgpack file holding a bare params pytree (no {'params': ...}
    wrapper) must overlay, not silently load 0 tensors."""
    import jax.numpy as jnp
    from flax import serialization as ser
    from tpucv.ckpt.checkpoint import load_pretrained

    params = {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))}}
    path = tmp_path / "bare.msgpack"
    path.write_bytes(ser.msgpack_serialize(
        jax.tree_util.tree_map(lambda x: np.asarray(x), params)))

    variables = {"params": {"dense": {"kernel": jnp.zeros((3, 4)),
                                      "bias": jnp.ones((4,))}}}
    out = load_pretrained(variables, str(path))
    np.testing.assert_array_equal(out["params"]["dense"]["kernel"],
                                  np.ones((3, 4)))
    np.testing.assert_array_equal(out["params"]["dense"]["bias"],
                                  np.zeros((4,)))


def test_divergence_detection_saves_diagnostic_and_raises(tmp_path):
    """A NaN loss stops training with a diagnostic checkpoint (failure
    detection, SURVEY §5.3 — absent in the reference)."""
    from tpucv.builder import export_from_registry
    from tpucv.trainer.yolo8_train import Yolo8Trainer

    cfg, _, trainer_cls = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 64
    cfg.train.batch_size = 2
    cfg.train.save_path = str(tmp_path)
    cfg.log.root = str(tmp_path)
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.device_aug = False
    tr = trainer_cls(cfg)
    # poison the initial params: guarantees a NaN loss at the first step
    tr.init_params = jax.tree_util.tree_map(
        lambda x: x * jnp.nan, tr.init_params)
    with pytest.raises(FloatingPointError, match="diverged"):
        tr.train(max_steps=5)
    assert any("diverged" in f for f in os.listdir(tmp_path))


def test_convert_model_extracts_pure_weights_from_trainstate(tmp_path):
    """convert_model on a FULL TrainState bundle (with a weight-decay
    optax chain, like real training saves) must not depend on
    reconstructing the optimizer structure."""
    import optax
    import convert_model
    from tpucv.builder import export_from_registry
    from tpucv.train.state import TrainState

    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 64
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-3))
    state = TrainState.create(
        dict(variables["params"]), dict(variables.get("batch_stats", {})),
        tx, use_ema=True)
    src = str(tmp_path / "full.ckpt")
    CheckPoint.save(state, src)

    dst = str(tmp_path / "pure.ckpt")
    # NOTE: converter builds the model at the registered cfg input size;
    # params are size-independent for conv nets so the overlay matches
    convert_model.extract_from_checkpoint("yolo8_det", src, dst)
    out = CheckPoint.load_pure(dst, {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {}))})
    a = jax.tree_util.tree_leaves(out["params"])
    b = jax.tree_util.tree_leaves(variables["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
