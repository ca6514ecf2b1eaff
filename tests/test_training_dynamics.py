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


def test_ssd_training_dynamics_parity():
    """The riskiest SSD surface (VERDICT r4 item 4): MultiBoxLossV2's
    batch-global hard-negative top-k (multi_box_loss.py:107-192) is a
    discrete choice re-made every step from the evolving conf logits — a
    systematic semantics bug (wrong neg count, wrong normalisation, wrong
    BN schedule through the VGG stack) compounds over steps where the
    1-step golden loss cannot see it.

    Both sides consume the SAME precomputed target tensors (tpucv's
    in-graph assigner output, converted to the reference's y_true layout),
    isolating the step semantics from target building. The torch side uses
    the documented layout correction (per-level permute before flatten, see
    test_golden_ssd.py) — a fixed permutation of the reference's
    channel-major flatten that realigns preds with the anchor order the
    targets are built in; loss values and gradients are unchanged by a
    consistent permutation. Reference step semantics:
    core/trainer/base.py:214-263, loss core/loss/multi_box_loss.py:77-192.
    """
    import torch
    from configs.ssd_cfg import SsdConfig as RefCfg
    from core.loss.multi_box_loss import MultiBoxLossV2
    from core.models.ssd_model import SSD as RefSSD

    import jax
    import jax.numpy as jnp
    import optax
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.importer import import_ssd, merge_into_variables
    from tpucv.targets.ssd import assign_ssd_targets_batch
    from tpucv.train.state import TrainState, make_train_step

    # lr=1e-4, not 1e-3: at 1e-3 the first Adam kick triples the loss
    # (9.5 -> 28.8) and SSD's batch-global hard-negative top-k amplifies
    # that fp chaos across ALL 17k anchors in the batch at once — the BN
    # metric measured 0.128 @step4 on identical semantics. The chaos term
    # scales with the step size (measured: 0.027 @step4 at lr=1e-4) while
    # the bug signal does not — a wrong momentum schedule diverges at full
    # strength at any lr, (0.9^4 vs 0.97^4) alone is ~0.23 on the
    # init-var component — so lr=1e-4 with the 0.08 bound separates bug
    # (0.23) from chaos (0.027) by ~1 order of magnitude on each side.
    nc_fg, S, B, K, N, MID = 20, 300, 2, 2, 40, 4
    lr = 1e-4
    batches = _det_batches(K, B, S, nc_fg, seed=7)

    cfg, algo_cls, _ = export_from_registry("ssd")
    cfg.train.mixed_precision = False
    algo = algo_cls(cfg)
    lcfg = cfg.loss
    # shared targets, built once per batch by the in-graph assigner
    targets = []
    for imgs, gt_boxes, gt_labels, gt_mask in batches:
        loc_t, cls_t, pos = assign_ssd_targets_batch(
            jnp.asarray(gt_boxes) / S, jnp.asarray(gt_labels),
            jnp.asarray(gt_mask), algo.priors, lcfg.overlap_threshold,
            cfg.arch.variances)
        targets.append((np.asarray(loc_t), np.asarray(cls_t),
                        np.asarray(pos)))

    # ---- reference side -------------------------------------------------
    rcfg = RefCfg()
    for obj in (rcfg, getattr(rcfg, "train", None), getattr(rcfg, "arch", None)):
        if obj is not None and hasattr(obj, "pretrained"):
            obj.pretrained = False
    torch.manual_seed(4)
    tm = RefSSD(rcfg)
    sd0 = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    criterion = MultiBoxLossV2(neg_pos_ratio=lcfg.neg_pos_ratio,
                               num_classes=nc_fg)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    tm.train()
    ref_losses = []
    for step in range(N):
        imgs = batches[step % K][0]
        loc_t, cls_t, pos = targets[step % K]
        onehot = np.eye(nc_fg + 1, dtype=np.float32)[cls_t]
        y_true = torch.from_numpy(np.concatenate(
            [loc_t, onehot, pos[..., None].astype(np.float32)], axis=-1))
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        x1, x2 = tm.backbone(x)
        sources = [tm.l2_norm(x1), x2] + list(tm.extras(x2))
        loc = torch.cat([l(s).permute(0, 2, 3, 1).reshape(B, -1, 4)
                         for l, s in zip(tm.locs, sources)], dim=1)
        conf = torch.cat([c(s).permute(0, 2, 3, 1).reshape(B, -1, nc_fg + 1)
                          for c, s in zip(tm.confs, sources)], dim=1)
        total, _, _ = criterion(y_true, (loc, conf))
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total))
        if step == MID - 1:
            sd_mid = {k: v.detach().numpy().copy()
                      for k, v in tm.state_dict().items()}

    # ---- tpucv side: same initial weights, production train step --------
    model = algo.build_model()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    variables = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}, import_ssd(sd0))

    from tpucv.losses.multibox import multibox_loss

    def loss_fn(raw, batch):
        loc_pred, conf_pred = raw
        return multibox_loss(
            loc_pred, conf_pred, batch["loc_t"], batch["cls_t"],
            batch["pos"], neg_pos_ratio=lcfg.neg_pos_ratio, alpha=lcfg.alpha)

    tx = optax.adam(lr)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_train_step(model.apply, loss_fn, tx)
    j_losses = []
    for step in range(N):
        imgs = batches[step % K][0]
        loc_t, cls_t, pos = targets[step % K]
        batch = {"images": jnp.asarray(imgs),
                 "loc_t": jnp.asarray(loc_t),
                 "cls_t": jnp.asarray(cls_t),
                 "pos": jnp.asarray(pos)}
        state, m = step_fn(state, batch)
        j_losses.append(float(m["loss"]))
        if step == MID - 1:
            bs_mid = jax.device_get(state.batch_stats)

    if os.environ.get("TPUCV_DYN_VERBOSE"):
        for i, (r, j) in enumerate(zip(ref_losses, j_losses)):
            print(f"ssd step {i}: ref {r:.5f} jax {j:.5f} "
                  f"rel {(j - r) / r:+.2e}")

    _curve_asserts(ref_losses, j_losses, early_rtol=0.02, late_rtol=0.10,
                   name="ssd")

    # BN running stats after MID identical steps (same metric/bound as the
    # yolov8 test — see its comment for the calibration)
    imported_mid = import_ssd(sd_mid)
    ref_flat = jax.tree_util.tree_flatten_with_path(
        imported_mid["batch_stats"])[0]
    got_flat = jax.tree_util.tree_flatten_with_path(bs_mid)[0]
    assert len(ref_flat) == len(got_flat)
    rel = 0.0
    for (rp, a), (gp, b) in zip(ref_flat, got_flat):
        assert jax.tree_util.keystr(rp) == jax.tree_util.keystr(gp)
        d = float(np.abs(a - np.asarray(b)).mean())
        s = max(float(np.abs(a).mean()), 0.02)
        if os.environ.get("TPUCV_DYN_VERBOSE") and d / s > 0.05:
            print(f"ssd bn {jax.tree_util.keystr(rp)}: rel {d / s:.3f} "
                  f"(ref absmean {float(np.abs(a).mean()):.4f})")
        rel = max(rel, d / s)
    assert rel < 0.08, f"SSD BN running stats diverged: {rel:.3f}"


def _yolo7_batches(n_batches, B, S, nc, seed):
    """Well-conditioned shared batches for OTA: well-separated, roughly
    anchor-shaped GTs centred on distinct cells (the regime where the
    reference's shared-candidate-pool quirks cannot trigger — see
    test_golden_yolov7_loss.py docstring), plus the (b, c, cx, cy, w, h)
    normalised rows the reference loss consumes."""
    rng = np.random.default_rng(seed)
    cands = [(32, 32, 14, 18), (96, 36, 38, 26), (36, 96, 20, 34),
             (94, 94, 34, 40), (64, 64, 16, 14)]
    out = []
    M = 4
    for k in range(n_batches):
        imgs = rng.random((B, S, S, 3)).astype(np.float32) * 0.5
        gt_xyxy = np.zeros((B, M, 4), np.float32)
        gt_cls = np.zeros((B, M), np.int32)
        gt_mask = np.zeros((B, M), bool)
        rows = []
        for b in range(B):
            n = 3 if (b + k) % 2 == 0 else 2
            for i in range(n):
                cx, cy, w, h = cands[(i + b + 2 * k) % len(cands)]
                cx += float(rng.normal() * 2)
                cy += float(rng.normal() * 2)
                c = int(rng.integers(0, nc))
                gt_xyxy[b, i] = [cx - w / 2, cy - h / 2,
                                 cx + w / 2, cy + h / 2]
                gt_cls[b, i] = c
                gt_mask[b, i] = True
                rows.append([b, c, cx / S, cy / S, w / S, h / S])
        out.append((imgs, gt_xyxy, gt_cls, gt_mask,
                    np.asarray(rows, np.float32)))
    return out


def test_yolov7_training_dynamics_parity():
    """The riskiest YOLOv7 surface (VERDICT r4 item 4): simOTA's dynamic-k
    assignment (core/loss/yolo7_loss.py:129-338) recomputes a discrete
    GT-anchor matching every step from the evolving predictions — the
    place where a systematic divergence between the reference's per-image
    python OTA and tpucv's vectorised static-slate OTA would compound.
    Same recipe as the other families: identical init (import_yolov7),
    identical batches, plain Adam both sides, loss curves + BN stats.

    lr=2e-4 and early_rtol=0.04, calibrated from measured profiles: at
    lr=1e-3 a single dynamic-k flip at step 1 already moves the loss 2.8%
    and by step 16 the two sides settle into different (equally valid)
    assignment optima 40% apart — OTA feeds its discrete matching back
    into the weights, so step-for-step parity at production lr is not a
    property this problem has. At 2e-4 the measured profile is ≤2.3%
    through step 4, ±6% tail — while the bug classes this test exists
    for (wrong loss normalisation ≥10% uniform shift from step 0, wrong
    BN schedule 0.23 on the stats metric) stay far outside the bounds.
    """
    import torch
    from configs.yolo7_cfg import Yolo7Config as RefCfg
    from core.loss.yolo7_loss import Yolo7Loss
    from core.models.yolov7_model import Yolo7 as RefYolo7

    import jax
    import jax.numpy as jnp
    import optax
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.importer import import_yolov7, merge_into_variables
    from tpucv.train.state import TrainState, make_train_step

    nc, S, B, K, N, MID = 20, 128, 2, 2, 40, 6
    batches = _yolo7_batches(K, B, S, nc, seed=13)

    # ---- reference side -------------------------------------------------
    rcfg = RefCfg()
    for obj in (rcfg, getattr(rcfg, "train", None), getattr(rcfg, "arch", None)):
        if obj is not None and hasattr(obj, "pretrained"):
            obj.pretrained = False
    torch.manual_seed(6)
    tm = RefYolo7(rcfg)
    sd0 = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    anchors9 = np.array([
        [12, 16], [19, 36], [40, 28], [36, 75], [76, 55], [72, 146],
        [142, 110], [192, 243], [459, 401]], np.float32)
    criterion = Yolo7Loss(anchors=anchors9, num_classes=nc,
                          input_shape=(S, S),
                          anchors_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]],
                          label_smoothing=0)
    opt = torch.optim.Adam(tm.parameters(), lr=2e-4)
    tm.train()
    ref_losses = []
    for step in range(N):
        imgs, _, _, _, rows = batches[step % K]
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        preds = tm(x)                               # (P5, P4, P3) NCHW
        total = criterion(preds, torch.from_numpy(rows), x)
        if isinstance(total, tuple):
            total = total[0]
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total))
        if step == MID - 1:
            sd_mid = {k: v.detach().numpy().copy()
                      for k, v in tm.state_dict().items()}

    # ---- tpucv side: same initial weights, production train step --------
    cfg, algo_cls, _ = export_from_registry("yolo7")
    cfg.train.mixed_precision = False
    cfg.dataset.input_size = S        # loss_gains scales obj by (S/640)^2
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    variables = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}, import_yolov7(sd0))

    tx = optax.adam(2e-4)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_train_step(model.apply, algo.build_loss(), tx)
    j_losses = []
    for step in range(N):
        imgs, gt_xyxy, gt_cls, gt_mask, _ = batches[step % K]
        batch = {"images": jnp.asarray(imgs),
                 "gt_bboxes": jnp.asarray(gt_xyxy),
                 "gt_labels": jnp.asarray(gt_cls),
                 "gt_mask": jnp.asarray(gt_mask)}
        state, m = step_fn(state, batch)
        j_losses.append(float(m["loss"]))
        if step == MID - 1:
            bs_mid = jax.device_get(state.batch_stats)

    if os.environ.get("TPUCV_DYN_VERBOSE"):
        for i, (r, j) in enumerate(zip(ref_losses, j_losses)):
            print(f"yolo7 step {i}: ref {r:.5f} jax {j:.5f} "
                  f"rel {(j - r) / r:+.2e}")

    _curve_asserts(ref_losses, j_losses, early_rtol=0.04, late_rtol=0.15,
                   name="yolov7")

    # BN metric: YOLOv7's SiLU activations are near-centred, so running
    # MEANS sit at absmean ~0.02 and a relative metric turns ~0.004 of fp
    # noise into 0.18 (measured at lr=2e-4 on identical semantics). Means
    # are therefore measured in units of activation SD (sqrt of the
    # sibling running var) — measured chaos ≤0.016 — while VARS keep the
    # relative metric, where a wrong momentum schedule still shows at
    # full strength ((0.9^6 vs 0.97^6)·|1-batch_var| ≈ 0.2).
    imported_mid = import_yolov7(sd_mid)
    ref_flat = jax.tree_util.tree_flatten_with_path(
        imported_mid["batch_stats"])[0]
    got_flat = jax.tree_util.tree_flatten_with_path(bs_mid)[0]
    assert len(ref_flat) == len(got_flat)
    ref_by_key = {jax.tree_util.keystr(p): np.asarray(a)
                  for p, a in ref_flat}
    rel = 0.0
    for (rp, a), (gp, b) in zip(ref_flat, got_flat):
        key = jax.tree_util.keystr(rp)
        assert key == jax.tree_util.keystr(gp)
        a, b = np.asarray(a), np.asarray(b)
        if key.endswith("['mean']"):
            var = ref_by_key[key[:-len("['mean']")] + "['var']"]
            m = float((np.abs(a - b) / np.sqrt(var + 1e-3)).mean())
        else:
            m = float(np.abs(a - b).mean()) / max(float(np.abs(a).mean()),
                                                  0.02)
        rel = max(rel, m)
    assert rel < 0.08, f"YOLOv7 BN running stats diverged: {rel:.3f}"


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
