"""Checkpoint backends: msgpack CheckPoint and Orbax manager roundtrips,
plus EMA tracking in TrainState."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpucv.ckpt.checkpoint import CheckPoint
from tpucv.train.state import TrainState, make_train_step


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
