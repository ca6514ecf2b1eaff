"""Multi-step training-dynamics parity vs the torch reference (VERDICT r3
item 4): feed IDENTICAL batches and initial weights to the reference's
training step (torch model + reference Loss + Adam) and to tpucv's
production jitted ``make_train_step``, and assert the LOSS CURVES and the
BN RUNNING STATS agree over ~100 steps. One-step golden losses prove the
loss function; this proves the *per-iteration semantics around it* — BN
batch-stat updates (torch momentum 0.03 ≡ flax 0.97), gradient flow through
the jitted step, and the optimizer update convention — where a systematic
divergence would compound step over step.

Optimizer is plain Adam on both sides (identical defaults in torch and
optax, incl. bias correction): the reference's LR schedules are separately
value-tested in test_parallel.py, and its ModelEMA is defined-but-unused
(lr_scheduler.py:55-84), so the step machinery is the surface under test.

Tolerances: both sides run f32 on CPU, but from a random init training is
mildly chaotic — per-step fp rounding (~1e-7) amplifies, so curves are
compared tightly early (the semantics check) and loosely late (the
no-systematic-drift check). Reference step semantics:
core/trainer/base.py:214-263.
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


def _det_batches(n_batches, B, S, nc, seed, max_objects=3):
    """Fixed synthetic detection batches shared verbatim by both sides."""
    from tpucv.data.detection_dataset import SyntheticDetectionIndex
    index = SyntheticDetectionIndex(
        n_batches * B, S, nc, max_objects=max_objects, seed=seed)
    M = max_objects + 1
    out = []
    for k in range(n_batches):
        imgs = np.zeros((B, S, S, 3), np.float32)
        gt_boxes = np.zeros((B, M, 4), np.float32)
        gt_labels = np.zeros((B, M), np.int32)
        gt_mask = np.zeros((B, M), bool)
        for j in range(B):
            img, boxes, labels = index[k * B + j]
            imgs[j] = img.astype(np.float32) / 255.0
            gt_boxes[j, :len(boxes)] = boxes
            gt_labels[j, :len(labels)] = labels
            gt_mask[j, :len(labels)] = True
        out.append((imgs, gt_boxes, gt_labels, gt_mask))
    return out


def _curve_asserts(ref_losses, j_losses, early_rtol, late_rtol, name):
    r = np.asarray(ref_losses)
    j = np.asarray(j_losses)
    # step 0: pure loss-function + backward parity on identical weights
    np.testing.assert_allclose(j[0], r[0], rtol=1e-3, err_msg=name)
    # early steps: semantics must track before fp chaos amplifies through
    # the discrete assignment decisions (measured divergence profile for
    # yolov8: <=0.05% through step 4, ~3-9% by step 7 — per-step rounding
    # flips top-k anchor picks, a property of the problem, not a bug)
    early = slice(0, 5)
    np.testing.assert_allclose(j[early], r[early], rtol=early_rtol,
                               err_msg=f"{name} early curve")
    # late: no systematic drift — compare trailing means, and both sides
    # must actually have learned (curve decreased)
    r_tail, j_tail = r[-15:].mean(), j[-15:].mean()
    assert abs(j_tail - r_tail) / r_tail < late_rtol, (
        name, r_tail, j_tail)
    assert r_tail < r[0] and j_tail < j[0], (name, "no learning")


def test_yolov8_training_dynamics_parity():
    import torch
    from configs import Yolo8DetConfig as RefCfg
    from core.algorithms.yolo_v8 import Loss as RefLoss
    from core.models.yolov8.yolo_v8 import get_yolo8_n as ref_get_n

    import jax.numpy as jnp
    import optax
    from tpucv.ckpt.importer import import_yolov8, merge_into_variables
    from tpucv.losses.yolov8 import yolov8_loss
    from tpucv.models import get_yolo8_n
    from tpucv.train.state import TrainState, make_train_step

    nc, S, B, K, N, MID = 8, 96, 4, 4, 100, 6
    batches = _det_batches(K, B, S, nc, seed=11)

    # ---- reference side -------------------------------------------------
    torch.manual_seed(3)
    tm = ref_get_n(nc=nc)
    sd0 = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    ref_cfg = RefCfg()
    ref_cfg.dataset.num_classes = nc
    criterion = RefLoss(ref_cfg, tm)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    tm.train()
    ref_losses = []
    for step in range(N):
        imgs, gt_boxes, gt_labels, gt_mask = batches[step % K]
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        bidx, cls, bb = [], [], []
        for j in range(B):
            for b, l in zip(gt_boxes[j][gt_mask[j]], gt_labels[j][gt_mask[j]]):
                bidx.append(j)
                cls.append(float(l))
                bb.append([(b[0] + b[2]) / 2 / S, (b[1] + b[3]) / 2 / S,
                           (b[2] - b[0]) / S, (b[3] - b[1]) / S])
        batch = {"batch_idx": torch.tensor(bidx, dtype=torch.float32),
                 "cls": torch.tensor(cls)[:, None],
                 "bboxes": torch.tensor(bb, dtype=torch.float32)}
        total, _ = criterion(tm(x), batch)
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total))
        if step == MID - 1:
            sd_mid = {k: v.detach().numpy().copy()
                      for k, v in tm.state_dict().items()}

    # ---- tpucv side: same initial weights, production train step --------
    model = get_yolo8_n(nc=nc, dtype=jnp.float32)
    import jax
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    variables = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}, import_yolov8(sd0))
    g = ref_cfg.loss

    def loss_fn(raw, batch):
        return yolov8_loss(
            raw, batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"],
            nc=nc, strides=(8, 16, 32),
            box_gain=g.box, cls_gain=g.cls, dfl_gain=g.dfl)

    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_train_step(model.apply, loss_fn, tx)
    j_losses = []
    for step in range(N):
        imgs, gt_boxes, gt_labels, gt_mask = batches[step % K]
        batch = {"images": jnp.asarray(imgs),
                 "gt_bboxes": jnp.asarray(gt_boxes),
                 "gt_labels": jnp.asarray(gt_labels),
                 "gt_mask": jnp.asarray(gt_mask)}
        state, m = step_fn(state, batch)
        j_losses.append(float(m["loss"]))
        if step == MID - 1:
            bs_mid = jax.device_get(state.batch_stats)

    _curve_asserts(ref_losses, j_losses, early_rtol=0.015, late_rtol=0.10,
                   name="yolov8")

    # ---- BN running stats after MID identical steps ----------------------
    # torch momentum 0.03 per iteration ≡ flax momentum 0.97; a wrong
    # schedule produces O(1) divergence at FULL STRENGTH from the first
    # step (stats move (1-0.97^k) of the way to the batch stats), while
    # fp-chaos amplification through the weight trajectories grows
    # exponentially. Measured profile of this metric on identical
    # semantics: 0.005 @step3, 0.039 @step6, 0.21 @step12 — so step 6 with
    # a 0.08 bound separates the two cleanly (2x headroom over chaos, >10x
    # margin to a real momentum bug). The scale floor 0.02 keeps near-zero
    # running MEANS (~1e-3, SiLU is near-centred) from dominating as pure
    # relative noise; the bug signal lives in the O(1) vars anyway.
    imported_mid = import_yolov8(sd_mid)
    ref_bs = jax.tree_util.tree_leaves(imported_mid["batch_stats"])
    got_bs = jax.tree_util.tree_leaves(bs_mid)
    assert len(ref_bs) == len(got_bs)
    diffs = [float(np.abs(a - np.asarray(b)).mean()) for a, b in
             zip(ref_bs, got_bs)]
    scale = [max(float(np.abs(a).mean()), 0.02) for a in ref_bs]
    rel = max(d / s for d, s in zip(diffs, scale))
    assert rel < 0.08, f"BN running stats diverged: max rel diff {rel:.3f}"


def test_centernet_training_dynamics_parity():
    """Non-TAL family: CenterNet (DLA-34 + focal/L1 heads). Both sides
    consume the SAME target tensors (tpucv's in-graph builder, itself
    golden-tested), isolating the step semantics from target building."""
    import torch
    from configs import CenternetConfig as RefCfg
    from core.loss.centernet_loss import CombinedLoss
    from core.models.centernet_model import CenterNet as RefCenterNet

    import jax
    import jax.numpy as jnp
    import optax
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.importer import import_centernet, merge_into_variables
    from tpucv.losses.centernet import centernet_loss
    from tpucv.targets.centernet import (CenterNetTargets,
                                         build_centernet_targets)
    from tpucv.train.state import TrainState, make_train_step

    nc, S, B, K, N = 20, 96, 2, 2, 50
    down, HW = 4, 24
    batches = _det_batches(K, B, S, nc, seed=5)
    # shared targets, built once per batch
    targets = []
    for imgs, gt_boxes, gt_labels, gt_mask in batches:
        t = build_centernet_targets(
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_mask), nc, (HW, HW), down)
        targets.append(jax.device_get(t))

    torch.manual_seed(2)
    ref_cfg = RefCfg()
    tm = RefCenterNet(ref_cfg)
    sd0 = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    l = ref_cfg.loss
    criterion = CombinedLoss(num_classes=nc, hm_weight=l.hm_weight,
                             wh_weight=l.wh_weight, off_weight=l.off_weight)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    tm.train()
    ref_losses = []
    for step in range(N):
        imgs = batches[step % K][0]
        t = targets[step % K]
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        y_true = (torch.from_numpy(np.asarray(t.heatmap)),
                  torch.from_numpy(np.asarray(t.reg)),
                  torch.from_numpy(np.asarray(t.wh)),
                  torch.from_numpy(np.asarray(t.mask, np.float32)),
                  torch.from_numpy(np.asarray(t.ind, np.int64)))
        total = criterion(tm(x), y_true)
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total))

    cfg, algo_cls, _ = export_from_registry("centernet")
    cfg.dataset.input_size = S
    cfg.train.mixed_precision = False
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    variables = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])},
        import_centernet(sd0))

    def loss_fn(raw, batch):
        t = CenterNetTargets(*[batch[k] for k in
                               ("heatmap", "ind", "wh", "reg", "mask")])
        return centernet_loss(raw, t, nc, l.hm_weight, l.wh_weight,
                              l.off_weight)

    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_train_step(model.apply, loss_fn, tx)
    j_losses = []
    for step in range(N):
        imgs = batches[step % K][0]
        t = targets[step % K]
        batch = {"images": jnp.asarray(imgs),
                 "heatmap": jnp.asarray(t.heatmap),
                 "ind": jnp.asarray(t.ind),
                 "wh": jnp.asarray(t.wh),
                 "reg": jnp.asarray(t.reg),
                 "mask": jnp.asarray(t.mask)}
        state, m = step_fn(state, batch)
        j_losses.append(float(m["loss"]))

    _curve_asserts(ref_losses, j_losses, early_rtol=0.02, late_rtol=0.10,
                   name="centernet")
