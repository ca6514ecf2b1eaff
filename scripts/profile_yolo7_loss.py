"""Per-stage timing of the YOLOv7 OTA loss forward on the real TPU.

Times jitted prefixes of the loss computation (each stage includes all
prior ones; the per-stage cost is the delta between consecutive rows), to
locate where the measured ~37 ms loss forward (B=32) actually goes:
candidate slate, cost matrix, dynamic-k sorts, the three scatters, the
one-hot target contraction, or the full-A loss reductions.

Run:  python scripts/profile_yolo7_loss.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=30):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.configs.model_cfgs import Yolo7Config
    from tpucv.losses.common import sigmoid_bce as _bce_logits
    from tpucv.losses.yolov7 import _flat_geometry
    from tpucv.ops.boxes import bbox_iou

    cfg = Yolo7Config()
    anchors = np.asarray(cfg.arch.anchors, np.float32).reshape(3, 3, 2)
    strides = cfg.arch.strides
    nc = 80
    B, S, M = args.batch, 640, 32
    nl, na = 3, 3
    feat_shapes = [(S // s, S // s) for s in strides]
    rng = np.random.default_rng(0)
    raw_maps = [jax.device_put(rng.standard_normal(
        (B, h, w, na * (5 + nc)), dtype=np.float32).astype(np.float32))
        for (h, w) in feat_shapes]
    gt_labels = jax.device_put(rng.integers(0, nc, (B, M)).astype(np.int32))
    gt_bboxes = jax.device_put((rng.random((B, M, 4)) * 300).astype(np.float32))
    gt_mask = jax.device_put(np.ones((B, M), bool))

    cx, cy, aw, ah, st, lid, offs = _flat_geometry(
        feat_shapes, strides, anchors)
    A = cx.shape[0]
    anchor_t, max_dynamic_k = 4.0, 20
    layer_balance = cfg.loss.layer_balance

    def stages(raw_maps, gt_bboxes, gt_labels, gt_mask, upto):
        acc = []
        cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        preds = jnp.concatenate(
            [m.reshape(B, -1, na, 5 + nc).reshape(B, -1, 5 + nc)
             for m in raw_maps], axis=1).astype(cdt)
        sig = jax.nn.sigmoid(preds[..., :4].astype(jnp.float32))
        px = (sig[..., 0] * 2.0 - 0.5 + cx[None]) * st[None]
        py = (sig[..., 1] * 2.0 - 0.5 + cy[None]) * st[None]
        pw = (sig[..., 2] * 2.0) ** 2 * aw[None]
        ph = (sig[..., 3] * 2.0) ** 2 * ah[None]
        pred_boxes = jnp.stack(
            [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], axis=-1)
        acc.append(pred_boxes.sum(dtype=jnp.float32))
        if upto == 0:
            return sum(acc)

        g_cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) / 2
        g_cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) / 2
        g_w = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        g_h = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        cand_flat, cand_valid = [], []
        for l, ((H, W), s) in enumerate(zip(feat_shapes, strides)):
            gx, gy = g_cx / s, g_cy / s
            cxi, cyi = jnp.floor(gx), jnp.floor(gy)
            dx = jnp.where(gx - cxi < 0.5, -1.0, 1.0)
            dy = jnp.where(gy - cyi < 0.5, -1.0, 1.0)
            for (ccx, ccy) in [(cxi, cyi), (cxi + dx, cyi), (cxi, cyi + dy)]:
                in_bounds = (ccx >= 0) & (ccx < W) & (ccy >= 0) & (ccy < H)
                ccxc = jnp.clip(ccx, 0, W - 1)
                ccyc = jnp.clip(ccy, 0, H - 1)
                for a in range(na):
                    r_w = g_w / (anchors[l, a, 0] + 1e-9)
                    r_h = g_h / (anchors[l, a, 1] + 1e-9)
                    ratio_ok = jnp.maximum(
                        jnp.maximum(r_w, 1 / (r_w + 1e-9)),
                        jnp.maximum(r_h, 1 / (r_h + 1e-9))) < anchor_t
                    flat = (offs[l] + (ccyc * W + ccxc) * na + a).astype(
                        jnp.int32)
                    cand_flat.append(flat)
                    cand_valid.append(in_bounds & ratio_ok & gt_mask)
        cand_flat = jnp.stack(cand_flat, axis=-1)
        cand_valid = jnp.stack(cand_valid, axis=-1)
        K = cand_flat.shape[-1]
        acc.append(cand_flat.sum().astype(jnp.float32))
        if upto == 1:
            return sum(acc)

        cand_boxes = jnp.take_along_axis(
            pred_boxes, cand_flat.reshape(B, M * K)[..., None],
            axis=1).reshape(B, M, K, 4)
        iou = bbox_iou(gt_bboxes[:, :, None, :], cand_boxes, xywh=False,
                       ciou=False)
        iou = jnp.clip(iou, 0.0, 1.0)
        cand_preds = jnp.take_along_axis(
            preds, cand_flat.reshape(B, M * K)[..., None],
            axis=1).reshape(B, M, K, 5 + nc)
        p_obj = jax.nn.sigmoid(cand_preds[..., 4:5].astype(jnp.float32))
        p_cls = jax.nn.sigmoid(cand_preds[..., 5:].astype(jnp.float32)) * p_obj
        onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc)
        y = jnp.sqrt(jnp.clip(p_cls, 1e-8, 1.0))
        bce = -(onehot[:, :, None, :] * jnp.log(y)
                + (1 - onehot[:, :, None, :]) * jnp.log(jnp.clip(1 - y, 1e-8)))
        cost = bce.sum(-1) - 3.0 * jnp.log(iou + 1e-8) + 1e5 * (~cand_valid)
        acc.append(cost.sum(dtype=jnp.float32))
        if upto == 2:
            return sum(acc)

        topk_iou, _ = jax.lax.top_k(jnp.where(cand_valid, iou, 0.0),
                                    min(max_dynamic_k, K))
        dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, max_dynamic_k)
        order = jnp.argsort(cost, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        selected = (rank < dyn_k[..., None]) & cand_valid
        acc.append(selected.sum().astype(jnp.float32))
        if upto == 3:
            return sum(acc)

        flat_bmk = cand_flat.reshape(B, M * K)
        cost_bmk = jnp.where(selected, cost, 1e9).reshape(B, M * K)
        best_cost = jnp.full((B, A), 1e9).at[
            jnp.arange(B)[:, None], flat_bmk].min(cost_bmk)
        final = selected & (
            cost <= best_cost[jnp.arange(B)[:, None], flat_bmk].reshape(
                B, M, K) + 1e-6)
        acc.append(final.sum().astype(jnp.float32))
        if upto == 4:
            return sum(acc)

        dump = A
        w_idx = jnp.where(final.reshape(B, M * K), flat_bmk, dump)
        matched = jnp.zeros((B, A), bool).at[
            jnp.arange(B)[:, None], w_idx].set(True, mode="drop")
        gt_for_anchor = jnp.zeros((B, A), jnp.int32).at[
            jnp.arange(B)[:, None], w_idx].set(
            jnp.broadcast_to(jnp.arange(M)[None, :, None],
                             (B, M, K)).reshape(B, M * K), mode="drop")
        acc.append(matched.sum().astype(jnp.float32)
                   + gt_for_anchor.sum().astype(jnp.float32))
        if upto == 5:
            return sum(acc)

        oh = jax.nn.one_hot(gt_for_anchor, M, dtype=jnp.float32)
        tgt_boxes = jnp.einsum("bam,bmc->bac", oh,
                               gt_bboxes.astype(jnp.float32))
        tgt_labels = jnp.einsum(
            "bam,bm->ba", oh, gt_labels.astype(jnp.float32)).astype(jnp.int32)
        acc.append(tgt_boxes.sum(dtype=jnp.float32))
        if upto == 6:
            return sum(acc)

        ciou = bbox_iou(pred_boxes, tgt_boxes, xywh=False, ciou=True)
        obj_target = jnp.where(matched, jax.lax.stop_gradient(
            jnp.clip(ciou, 0.0, 1.0)), 0.0)
        obj_bce = _bce_logits(preds[..., 4], obj_target.astype(cdt))
        cls_target = (jax.nn.one_hot(tgt_labels, nc, dtype=cdt)
                      * matched[..., None])
        cls_bce = _bce_logits(preds[..., 5:], cls_target).sum(
            -1, dtype=jnp.float32)
        loss = 0.0
        for l in range(nl):
            sel = lid[None] == l
            m_l = matched & sel
            denom = jnp.maximum(m_l.sum(), 1).astype(jnp.float32)
            loss = loss + jnp.where(m_l, 1.0 - ciou, 0.0).sum() / denom
            loss = loss + jnp.where(m_l, cls_bce, 0.0).sum() / (denom * nc)
            loss = loss + layer_balance[l] * jnp.where(sel, obj_bce, 0.0).sum(
                dtype=jnp.float32) / jnp.maximum(sel.sum() * B, 1)
        acc.append(loss)
        return sum(acc)

    names = ["0 pred_boxes     ", "1 cand slate     ", "2 gathers+cost   ",
             "3 topk+argsorts  ", "4 scatter-min    ", "5 match scatters ",
             "6 one-hot einsum ", "7 full-A losses  "]
    prev = 0.0
    for u in range(8):
        fn = jax.jit(lambda r, b, l, m, u=u: stages(r, b, l, m, u))
        t = timed(fn, (raw_maps, gt_bboxes, gt_labels, gt_mask))
        print(f"{names[u]} cum {t:8.2f} ms   delta {t - prev:8.2f} ms",
              flush=True)
        prev = t
    os._exit(0)


if __name__ == "__main__":
    main()
