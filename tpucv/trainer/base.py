"""BaseTrainer — the template-method epoch loop
(reference ``core/trainer/base.py:48-295``), TPU-native.

Same skeleton: __init__ wires set_model_algorithm -> load_data ->
initialize_model -> set_optimizer -> set_criterion, ``train()`` owns the epoch
loop, resume, periodic eval + checkpoint, file log + TensorBoard. Deltas:
  * no GradScaler — bf16 needs none (reference base.py:193-196)
  * optimizer/scheduler are optax (iteration-stepped, reproducing the
    reference's per-iteration warmup+multistep, base.py:121-122, 261-263)
  * the whole train step is one jitted, mesh-sharded function; host work is
    batching + logging only
  * datasets fall back to synthetic data when the configured root is absent,
    so smoke training runs anywhere.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpucv.ckpt.checkpoint import CheckPoint
from tpucv.data.loader import Loader
from tpucv.ops.preprocess import normalize_images
from tpucv.parallel import mesh as pmesh
from tpucv.train.schedules import warmup_multistep
from tpucv.train.state import TrainState, make_train_step, make_eval_step


class MeanMetric:
    """Streaming mean (reference base.py:31-45)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, v: float):
        self.total += float(v)
        self.count += 1

    def result(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self):
        self.total, self.count = 0.0, 0


class BaseTrainer:
    # True for trainers whose loss scales with the batch size (the YOLOv8
    # family's ``mean * B``); controls how grad_accum combines micro-grads
    # (see train/state.py make_train_step).
    LOSS_BATCH_SCALED = False

    def __init__(self, cfg, use_synthetic_fallback: bool = True):
        self.cfg = cfg
        self.use_synthetic_fallback = use_synthetic_fallback
        # mesh = (data, model): model axis from config (channel sharding),
        # then the largest data-axis size that divides the batch (a 8-device
        # CPU test mesh with batch 2 must degrade to 2-way DP, not crash)
        n_dev = len(jax.devices())
        bs = cfg.train.batch_size
        n_model = max(1, getattr(cfg.train, "n_model", 1))
        if n_dev % n_model:
            raise ValueError(
                f"train.n_model={n_model} does not divide the "
                f"{n_dev} available devices")
        avail = n_dev // n_model
        n_data = next(d for d in range(min(avail, bs), 0, -1)
                      if bs % d == 0)
        self.mesh = pmesh.create_mesh(
            n_data, n_model, jax.devices()[:n_data * n_model])
        self.compute_dtype = (jnp.bfloat16 if cfg.train.mixed_precision
                              else jnp.float32)

        self.set_model_algorithm()
        self.load_data()
        self.initialize_model()
        self.set_optimizer()
        self.set_criterion()
        self._setup_logging()

    # --------------------------------------------------- subclass hooks
    def set_model_algorithm(self):
        raise NotImplementedError

    def load_data(self):
        raise NotImplementedError

    def initialize_model(self):
        self.model = self.algorithm.build_model()
        variables = self.algorithm.init_variables(self.model)
        # pretrained bootstrap (reference use_pretrained_model decorator,
        # core/trainer/base.py:16-28 + core/utils/ckpt.py:19-36): partial,
        # shape-matched load from a tpucv variables file or a torch .pth
        pw = getattr(self.cfg.train, "pretrained_weights", "")
        if pw:
            from tpucv.ckpt.checkpoint import load_pretrained
            if os.path.exists(pw):
                variables = load_pretrained(
                    variables, pw, self.cfg.model_name,
                    getattr(self, "logger", None))
            else:
                print(f"WARNING: pretrained_weights {pw!r} not found — "
                      f"training from scratch")
        self.init_params = variables["params"]
        self.init_batch_stats = variables.get("batch_stats", {})

    def set_optimizer(self):
        o = self.cfg.optimizer
        iters_per_epoch = max(len(self.train_loader), 1)
        milestones = [m * iters_per_epoch for m in o.milestones]
        self.lr_schedule = warmup_multistep(
            o.lr, o.warmup_iters, milestones, o.gamma)
        tx = optax.adam(self.lr_schedule)
        if o.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(o.weight_decay), tx)
        self.tx = tx

    def set_criterion(self):
        self.loss_fn = self.algorithm.build_loss()

    # ------------------------------------------------------- batch prep
    def device_batch(self, batch: Dict[str, np.ndarray],
                     train: bool = False) -> Dict:
        batch = dict(batch)
        batch["images"] = batch["images"].astype(np.uint8)
        host_aug = batch.pop("host_aug", None)
        use_dev_aug = (train and getattr(self.cfg.train, "device_aug", False)
                       and "gt_bboxes" in batch)
        if use_dev_aug:
            from tpucv.ops.augment import AffineParams
            B = batch["images"].shape[0]
            rng = np.random.default_rng(
                int(self._aug_seed) if hasattr(self, "_aug_seed") else 0)
            self._aug_seed = getattr(self, "_aug_seed", 0) + 1
            S = batch["images"].shape[1]
            scale = rng.uniform(0.5, 1.5, B).astype(np.float32)
            max_shift = np.maximum(S * (1.0 - scale), 0.0)
            shift = (rng.random((B, 2)).astype(np.float32)
                     * max_shift[:, None])
            flip = rng.random(B) < 0.5
            hsv = (1.0 + (rng.random((B, 3)) * 2 - 1)
                   * np.array([0.1, 0.7, 0.4])).astype(np.float32)
            if host_aug is not None:
                # mosaic samples arrive fully augmented (incl. HSV) from the
                # host, like the reference's mosaic path — neutralise the
                # on-chip affine/HSV so they are not augmented twice
                ha = np.asarray(host_aug, bool)
                scale[ha] = 1.0
                shift[ha] = 0.0
                flip[ha] = False
                hsv[ha] = 1.0
            batch["aug_scale"] = scale
            batch["aug_shift"] = shift
            batch["aug_flip"] = flip
            batch["aug_hsv"] = hsv
        out = pmesh.shard_batch(batch, self.mesh)
        if use_dev_aug:
            if not hasattr(self, "_aug_fn"):
                from tpucv.ops.augment import AffineParams, augment_batch
                dt = self.compute_dtype

                @jax.jit
                def _aug(images_u8, boxes, scale, shift, flip, hsv):
                    return augment_batch(
                        images_u8, boxes,
                        AffineParams(scale, shift, flip, hsv), dtype=dt)

                self._aug_fn = _aug
            imgs, boxes = self._aug_fn(
                out["images"], out["gt_bboxes"], out.pop("aug_scale"),
                out.pop("aug_shift"), out.pop("aug_flip"), out.pop("aug_hsv"))
            out["images"] = imgs
            out["gt_bboxes"] = boxes
            # drop boxes augmented to degeneracy
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            out["gt_mask"] = out["gt_mask"] & (w > 2) & (h > 2)
        else:
            out["images"] = normalize_images(out["images"], self.compute_dtype)
        return out

    # ----------------------------------------------------------- logging
    def _setup_logging(self):
        os.makedirs(self.cfg.log.root, exist_ok=True)
        name = f"{self.cfg.model_name}_{self.cfg.dataset.name}"
        log_path = os.path.join(
            self.cfg.log.root, f"{name}_{time.strftime('%Y%m%d%H%M%S')}.log")
        self.logger = logging.getLogger(f"TRAIN.{name}")
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        fh = logging.FileHandler(log_path)
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        self.logger.addHandler(fh)
        self.logger.addHandler(logging.StreamHandler())
        self.tb = None
        if self.cfg.log.tensorboard_on:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(
                    os.path.join(self.cfg.log.tensorboard_dir, name))
            except Exception as e:  # pragma: no cover
                self.logger.info(f"tensorboard disabled: {e}")

    # ------------------------------------------------------------- train
    def train(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        with self.mesh:
            params = pmesh.shard_params(self.init_params, self.mesh)
            batch_stats = jax.device_put(
                self.init_batch_stats, pmesh.replicated(self.mesh))
            state = TrainState.create(
                params, batch_stats, self.tx,
                use_ema=cfg.optimizer.ema_decay > 0)
            zero_opt = getattr(cfg.train, "zero_opt", False)
            plan = pmesh.plan_state_shardings(state, self.mesh, zero_opt)
            state = jax.tree_util.tree_map(jax.device_put, state, plan)

            ckpt_dir = cfg.train.save_path
            start_epoch = 0
            if cfg.train.resume_training and cfg.train.last_epoch >= 0:
                path = self._ckpt_path(cfg.train.last_epoch)
                state = CheckPoint.load(path, state)
                state = jax.tree_util.tree_map(jax.device_put, state, plan)
                start_epoch = cfg.train.last_epoch + 1
                self.logger.info(f"resumed from {path}")

            accum = max(1, getattr(cfg.train, "grad_accum", 1))
            if cfg.train.batch_size % accum:
                raise ValueError(
                    f"train.grad_accum={accum} must divide "
                    f"batch_size={cfg.train.batch_size}")
            train_step = make_train_step(
                self.model.apply, self.loss_fn, self.tx,
                ema_decay=cfg.optimizer.ema_decay,
                state_sharding=plan, grad_accum=accum,
                loss_batch_scaled=self.LOSS_BATCH_SCALED)

            self.logger.info(f"config: {cfg}")
            global_step = start_epoch * len(self.train_loader)
            done = False
            for epoch in range(start_epoch, cfg.train.epochs):
                self.train_loader.set_epoch(epoch)
                metrics_acc: Dict[str, MeanMetric] = {}
                t_ep = time.time()
                for bi, batch in enumerate(self.train_loader):
                    state, metrics = train_step(
                        state, self.device_batch(batch, train=True))
                    global_step += 1
                    if (bi + 1) % cfg.log.print_interval == 0 or bi == 0:
                        metrics = {k: float(v) for k, v in
                                   jax.device_get(metrics).items()}
                        # failure detection (no reference counterpart --
                        # SURVEY §5.3): a non-finite loss means the run is
                        # dead; save a diagnostic checkpoint and stop
                        # instead of burning the remaining epochs. Piggybacks
                        # on the periodic metrics fetch: zero extra syncs.
                        if not all(np.isfinite(v) for v in metrics.values()):
                            path = self._ckpt_path(epoch).replace(
                                ".ckpt", "-diverged.ckpt")
                            CheckPoint.save(state, path)
                            self.logger.error(
                                f"non-finite metrics at epoch {epoch} step "
                                f"{bi + 1}: {metrics} — diagnostic state "
                                f"saved to {path}")
                            raise FloatingPointError(
                                f"training diverged (step {global_step}): "
                                f"{metrics}")
                        for k, v in metrics.items():
                            metrics_acc.setdefault(k, MeanMetric()).update(v)
                        lr = float(self.lr_schedule(global_step))
                        msg = (f"epoch {epoch} step {bi + 1}/"
                               f"{len(self.train_loader)} lr={lr:.2e} "
                               + " ".join(f"{k}={v:.4f}"
                                          for k, v in metrics.items()))
                        self.logger.info(msg)
                        if self.tb:
                            self.tb.add_scalar("lr", lr, global_step)
                            for k, v in metrics.items():
                                self.tb.add_scalar(f"train/{k}", v, global_step)
                    if max_steps and global_step >= max_steps:
                        done = True
                        break
                ep_means = " ".join(
                    f"{k}={m.result():.4f}" for k, m in metrics_acc.items())
                self.logger.info(
                    f"epoch {epoch} done in {time.time() - t_ep:.1f}s "
                    f"(means over logged steps: {ep_means})")
                if (epoch + 1) % cfg.train.eval_interval == 0:
                    val = self.evaluate_loop(state)
                    if getattr(cfg.train, "eval_map", False):
                        val.update(self.evaluate_map(state))
                    self.last_eval = val
                    self.logger.info(f"eval epoch {epoch}: {val}")
                    if self.tb:
                        for k, v in val.items():
                            self.tb.add_scalar(f"val/{k}", v, global_step)
                if (epoch + 1) % cfg.train.save_interval == 0 or done:
                    path = self._ckpt_path(epoch)
                    CheckPoint.save(state, path)
                    self.logger.info(f"saved {path}")
                if done:
                    break
            final = self._ckpt_path(cfg.train.epochs - 1, final=True)
            CheckPoint.save(state, final)
            self.logger.info(f"saved final {final}")
            return state

    def _ckpt_path(self, epoch: int, final: bool = False) -> str:
        tag = "final" if final else f"epoch-{epoch}"
        return os.path.join(
            self.cfg.train.save_path,
            f"{self.cfg.model_name}_{self.cfg.dataset.name}_{tag}.ckpt")

    # -------------------------------------------------------------- eval
    def evaluate_map(self, state) -> Dict[str, float]:
        """In-training detection mAP over the val index via the batched eval
        harness (train.eval_map=True) — observability the reference's
        val-loss-only loop lacks. COCO-style indices get the 12-metric
        COCOeval (logged as AP/AP50); everything else the VOC engine
        (mAP@0.5). Uses EMA params when EMA is on (what eval would ship)."""
        index = getattr(self, "val_index", None)
        algo = getattr(self, "algorithm", None)
        if index is None or algo is None or not hasattr(algo, "make_infer_fn"):
            return {}
        variables = {
            "params": state.ema_params if state.ema_params is not None
            else state.params,
            "batch_stats": state.batch_stats,
        }
        conf = getattr(self.cfg.train, "eval_map_conf", 0.01)
        bs = self.cfg.train.batch_size
        if hasattr(index, "eval_gt_records"):       # COCO protocol
            stats = algo.evaluate_on_coco(
                variables, index, batch_size=bs, conf_threshold=conf,
                result_dir=os.path.join(self.cfg.log.root, "eval"),
                verbose=False)
            return {"map": stats["AP"], "map50": stats["AP50"]}
        if not hasattr(algo, "evaluate_on_voc"):
            # non-detection algorithm (classification): no mAP protocol
            return {}
        res = algo.evaluate_on_voc(
            variables, index, batch_size=bs, conf_threshold=conf,
            verbose=False)
        return {"map50": res["mAP"]}

    def evaluate_loop(self, state) -> Dict[str, float]:
        """Default: mean val loss (reference yolo8_train.py:113-129)."""
        eval_step = getattr(self, "_eval_step", None)
        if eval_step is None:
            self._eval_step = eval_step = make_eval_step(
                self.model.apply, self.loss_fn)
        acc: Dict[str, MeanMetric] = {}
        for batch in self.val_loader:
            metrics = jax.device_get(eval_step(state, self.device_batch(batch)))
            for k, v in metrics.items():
                acc.setdefault(k, MeanMetric()).update(float(v))
        return {f"val_{k}": m.result() for k, m in acc.items()}
