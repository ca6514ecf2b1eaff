"""Mesh/sharding correctness on the 8-device CPU mesh: DP gradient averaging
equals single-device full-batch gradients (the property NCCL allreduce would
provide; here XLA inserts the collective from shardings)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpucv.parallel import mesh as pmesh
from tpucv.train.schedules import warmup_multistep
from tpucv.train.state import TrainState, make_train_step


def test_mesh_shapes():
    m = pmesh.create_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())


def test_dp_grads_match_single_device():
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(8, name="d1")(x)
            x = nn.relu(x)
            # track a batch stat to exercise the mutable path
            nn.BatchNorm(use_running_average=not train, name="bn")(x)
            return nn.Dense(1, name="d2")(x)

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(8, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(raw, batch):
        l = jnp.mean((raw - batch["y"]) ** 2)
        return l, {}

    tx = optax.sgd(0.1)

    def run(mesh):
        with mesh:
            params = pmesh.shard_params(variables["params"], mesh)
            bs = jax.device_put(variables["batch_stats"],
                                pmesh.replicated(mesh))
            state = TrainState.create(params, bs, tx)
            batch = pmesh.shard_batch({"images": x, "y": y}, mesh)
            step = make_train_step(model.apply, loss_fn, tx, donate=False)
            new_state, metrics = step(state, batch)
            return (jax.device_get(new_state.params),
                    float(metrics["loss"]))

    p8, l8 = run(pmesh.create_mesh(8, 1))
    p1, l1 = run(pmesh.create_mesh(1, 1, jax.devices()[:1]))
    assert abs(l8 - l1) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_channel_sharded_grads_match_single_device():
    """(data=4, model=2) with param_sharding_rule actually channel-sharding
    a large conv kernel — the exact mesh the driver dryrun runs — must give
    the same loss and updated params as a single device (VERDICT r2 #4)."""
    from flax import linen as nn
    from jax.sharding import PartitionSpec as P

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            # 3*3*64*128 = 73,728 params >= 1<<16: the sharding rule fires
            x = nn.Conv(64, (1, 1), name="c0")(x)
            x = nn.relu(x)
            x = nn.Conv(128, (3, 3), padding="SAME", name="c1")(x)
            x = nn.relu(x)
            nn.BatchNorm(use_running_average=not train, name="bn")(x)
            return nn.Conv(1, (1, 1), name="c2")(x)

    model = Net()
    x = np.random.default_rng(0).normal(size=(8, 8, 8, 3)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(8, 8, 8, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(raw, batch):
        return jnp.mean((raw - batch["y"]) ** 2), {}

    tx = optax.sgd(0.1)

    def run(mesh):
        with mesh:
            params = pmesh.shard_params(variables["params"], mesh)
            if mesh.shape["model"] > 1:
                # the rule must have sharded c1's kernel over the model axis
                spec = params["c1"]["kernel"].sharding.spec
                assert spec == P(None, None, None, "model"), spec
            bs = jax.device_put(variables["batch_stats"],
                                pmesh.replicated(mesh))
            state = TrainState.create(params, bs, tx)
            batch = pmesh.shard_batch({"images": x, "y": y}, mesh)
            step = make_train_step(model.apply, loss_fn, tx, donate=False)
            new_state, metrics = step(state, batch)
            return jax.device_get(new_state.params), float(metrics["loss"])

    p42, l42 = run(pmesh.create_mesh(4, 2))
    p1, l1 = run(pmesh.create_mesh(1, 1, jax.devices()[:1]))
    assert abs(l42 - l1) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p42),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_zero_opt_sharding_matches_replicated():
    """ZeRO-1 optimizer-state sharding: adam moments sharded over the data
    axis produce bit-equivalent training to replicated moments, and the
    moments actually END UP sharded (the constraint holds across steps)."""
    from flax import linen as nn
    from jax.sharding import PartitionSpec as P
    from tpucv.train.state import TrainState, make_train_step

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(256, name="d1")(x)   # 32*256 moments > min_size
            x = nn.relu(x)
            nn.BatchNorm(use_running_average=not train, name="bn")(x)
            return nn.Dense(8, name="d2")(x)

    model = Net()
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(16, 8)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(raw, batch):
        return jnp.mean((raw - batch["y"]) ** 2), {}

    tx = optax.adam(0.05)

    def run(mesh, zero_opt):
        with mesh:
            params = pmesh.shard_params(variables["params"], mesh)
            state = TrainState.create(params, variables["batch_stats"], tx)
            plan = pmesh.plan_state_shardings(state, mesh, zero_opt)
            state = jax.tree_util.tree_map(jax.device_put, state, plan)
            step = make_train_step(model.apply, loss_fn, tx, donate=False,
                                   state_sharding=plan)
            batch = pmesh.shard_batch({"images": x, "y": y}, mesh)
            for _ in range(3):
                state, metrics = step(state, batch)
            return state, float(metrics["loss"])

    mesh = pmesh.create_mesh(8, 1)
    s_zero, l_zero = run(mesh, zero_opt=True)
    s_rep, l_rep = run(mesh, zero_opt=False)
    assert abs(l_zero - l_rep) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(s_zero.params),
                    jax.tree_util.tree_leaves(s_rep.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # at least the d1 kernel moments must END UP data-sharded
    sharded_specs = [
        l.sharding.spec for l in jax.tree_util.tree_leaves(s_zero.opt_state)
        if hasattr(l, "sharding") and l.sharding.spec != P()]
    assert sharded_specs, "no optimizer moment ended up ZeRO-sharded"
    assert all("data" in [ax for ax in spec if ax is not None]
               for spec in sharded_specs)


def test_grad_accum_matches_full_batch():
    """G sequential micro-batches with averaged grads == one full-batch
    step for a mean loss (no BN: batch stats make accumulation
    intentionally sequential-semantics there)."""
    from flax import linen as nn
    from tpucv.train.state import TrainState, make_train_step

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(32, name="d1")(x)
            x = nn.relu(x)
            return nn.Dense(4, name="d2")(x)

    model = Net()
    x = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(raw, batch):
        return jnp.mean((raw - batch["y"]) ** 2), {}

    tx = optax.sgd(0.1)
    batch = {"images": jnp.asarray(x), "y": jnp.asarray(y)}

    def run(accum):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model.apply, loss_fn, tx, donate=False,
                               grad_accum=accum)
        state, metrics = step(state, batch)
        return jax.device_get(state.params), float(metrics["loss"])

    p1, l1 = run(1)
    p4, l4 = run(4)
    assert abs(l1 - l4) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # batch-size-scaled loss (the YOLOv8-family mean*B convention): summed
    # micro-grads must reproduce the full-batch step; the old averaging
    # would shrink the effective LR by G
    def loss_scaled(raw, batch):
        B = raw.shape[0]
        return jnp.mean((raw - batch["y"]) ** 2) * B, {}

    def run_scaled(accum):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model.apply, loss_scaled, tx, donate=False,
                               grad_accum=accum, loss_batch_scaled=True)
        state, metrics = step(state, batch)
        return jax.device_get(state.params), float(metrics["loss"])

    ps1, ls1 = run_scaled(1)
    ps4, ls4 = run_scaled(4)
    assert abs(ls1 - ls4) < 1e-5 * max(abs(ls1), 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(ps1),
                    jax.tree_util.tree_leaves(ps4)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_grad_accum_with_bn_trainer_smoke(tmp_path):
    """grad_accum through the production trainer on a BN model: runs and
    stays finite (stats thread sequentially through the micro-steps)."""
    from flax import linen as nn
    from tpucv.train.state import TrainState, make_train_step

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(16, name="d1")(x)
            nn.BatchNorm(use_running_average=not train, name="bn")(x)
            return nn.Dense(2, name="d2")(x)

    model = Net()
    x = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(raw, batch):
        return jnp.mean(raw ** 2), {}

    tx = optax.sgd(0.01)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx)
    step = make_train_step(model.apply, loss_fn, tx, donate=False,
                           grad_accum=2)
    state, metrics = step(state, {"images": jnp.asarray(x)})
    assert np.isfinite(float(metrics["loss"]))
    # running stats moved off init (both micro-steps applied)
    mean = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert float(jnp.abs(np.asarray(mean)).sum()) > 0


def test_warmup_multistep_schedule_values():
    sched = warmup_multistep(1.0, 10, [100, 200], 0.1)
    assert abs(float(sched(0)) - 0.1) < 1e-6         # (0+1)/10
    assert abs(float(sched(9)) - 1.0) < 1e-6
    assert abs(float(sched(50)) - 1.0) < 1e-6
    assert abs(float(sched(150)) - 0.1) < 1e-6
    assert abs(float(sched(250)) - 0.01) < 1e-6


def test_exponential_warmup_matches_reference_formula():
    """warmup_kind='exponential' == the vendored pytorch_warmup
    ExponentialWarmup factor 1 - exp(-(step+1)/period) (reference
    warm_up.py:106-119), composed with multistep decay."""
    import math
    from tpucv.train.schedules import (
        untuned_exponential_warmup_tau, untuned_linear_warmup_period)

    tau = 25
    sched = warmup_multistep(2.0, tau, [50], 0.1,
                             warmup_kind="exponential")
    for step in (0, 5, 24, 49, 60):
        expect = 2.0 * (1.0 - math.exp(-(step + 1) / tau))
        if step >= 50:
            expect *= 0.1
        assert abs(float(sched(step)) - expect) < 1e-6, step

    # untuned periods follow the Adam rule (warm_up.py:123-159)
    assert untuned_linear_warmup_period(0.999) == 2000
    assert abs(untuned_exponential_warmup_tau(0.999) - 1000.0) < 1e-9


def test_spatial_partitioning_matches_replicated():
    """Height-sharded (B, H, W, C) conv forward + grads == replicated:
    the SPMD partitioner must insert correct halo exchanges for stride-2
    convs and pooling under spatial partitioning."""
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=2, padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(16, (3, 3), strides=2, padding="SAME")(x)
            x = nn.avg_pool(x, (2, 2), (2, 2))
            return nn.Conv(16, (3, 3), padding="SAME")(x)

    model = Net()
    x = np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v, xx):
        return jnp.sum(model.apply(v, xx) ** 2)

    g = jax.jit(jax.value_and_grad(loss))

    mesh = pmesh.create_mesh(2, 4)
    with mesh:
        xs = jax.device_put(x, pmesh.spatial_batch_sharding(mesh))
        vs = jax.device_put(variables, pmesh.replicated(mesh))
        l_sp, g_sp = jax.device_get(g(vs, xs))
    l_re, g_re = jax.device_get(g(variables, x))
    assert abs(l_sp - l_re) / abs(l_re) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_re)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_batch_sharded_inference_matches_single_device():
    """Multi-chip SERVING: the standard infer_fn (forward + decode + NMS)
    accepts a batch sharded over the data axis — per-image math is
    independent, so XLA partitions the whole pipeline with no collectives
    and the detections must match the unsharded run."""
    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.configs.model_cfgs import Yolo8DetConfig

    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = 64
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 64
    cfg.decode.max_det = 16
    algo = YOLOv8(cfg)
    algo.nc = 8
    variables = algo.init_variables(seed=0)
    infer = algo.make_infer_fn(conf_threshold=0.05)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8))
    ref = jax.device_get(infer(variables, imgs))

    mesh = pmesh.create_mesh(8, 1)
    rep = pmesh.replicated(mesh)
    sv = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), variables)
    si = jax.device_put(imgs, pmesh.batch_sharding(mesh))
    out = jax.device_get(infer(sv, si))

    b_r, s_r, c_r, v_r = ref
    b_o, s_o, c_o, v_o = out
    np.testing.assert_array_equal(v_r, v_o)
    np.testing.assert_array_equal(c_r[v_r], c_o[v_o])
    np.testing.assert_allclose(s_r[v_r], s_o[v_o], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b_r[v_r], b_o[v_o], rtol=1e-4, atol=1e-3)


def test_multihost_initialize_failure_policy(monkeypatch):
    """Init failures must be loud on a pod and silent only for plain
    single-process runs (VERDICT r3 weak #4): a pod that silently falls
    back to single-process trains with the wrong world size."""
    import pytest
    from tpucv.parallel import multihost

    calls = {"n": 0}

    def boom(**kwargs):
        calls["n"] += 1
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    for marker in multihost._POD_ENV_MARKERS:
        monkeypatch.delenv(marker, raising=False)

    # plain single-process: swallowed
    multihost.initialize()
    assert calls["n"] == 1

    # caller asked for a real multi-process world: re-raised
    with pytest.raises(RuntimeError, match="no coordinator"):
        multihost.initialize(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=0)

    # pod environment marker present: re-raised even with no args
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    with pytest.raises(RuntimeError, match="no coordinator"):
        multihost.initialize()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    # init "succeeds" but the world size is wrong: loud
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: None)
    with pytest.raises(RuntimeError, match="process_count"):
        multihost.initialize(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=0)
