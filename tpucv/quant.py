"""Post-training int8 quantization (PTQ) for inference.

The reference declares a deploy capability but ships empty stubs
(``core/deploy/onnx.py`` / ``core/deploy/tensorrt.py``, 0 LoC — SURVEY
§1.11); TensorRT's flagship deploy feature is int8 PTQ.  This module is the
TPU-native equivalent: v5e's MXU runs int8 at ~2x the bf16 rate, so the
conv-dominated detection forwards can roughly halve their MXU time.

Scheme (standard TensorRT-style PTQ):
  * weights: BatchNorm folded into the conv kernel, then symmetric
    per-output-channel int8 (exact representable range, no zero points);
  * activations: symmetric per-tensor int8, scale calibrated as the running
    absolute maximum over calibration batches;
  * accumulation in int32 on the MXU, dequantize + bias + SiLU in f32/bf16
    (fused by XLA into the conv epilogue).

Integration is transparent: ``quantize_for_inference`` returns the same
variables dict plus a ``quant`` collection; every ``ConvBnAct`` that finds
its entry takes the int8 path (``tpucv/nn/blocks.py``), everything else
(stem, depthwise, heads, residual adds, decode) stays float.  The harness,
predict CLI and bench all accept the augmented variables unchanged.

Skips: convs whose per-group input width is below ``min_in_ch`` (the
3-channel stem and depthwise convs — MXU-hostile in int8 and
accuracy-sensitive) and convs never hit during calibration.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def calibrate(model, variables, batches: Iterable, **apply_kwargs):
    """Run calibration batches through the model, collecting each quantizable
    conv's input absolute maximum (sown by ``ConvBnAct``).  Returns the
    ``quant_stats`` pytree (f32 scalars keyed by module scope)."""
    @jax.jit
    def run(v, x):
        _, aux = model.apply(v, x, mutable=["quant_stats"], **apply_kwargs)
        # models with no quantizable conv sow nothing -> empty stats tree
        return aux.get("quant_stats", {})

    stats = None
    for x in batches:
        s = run(variables, x)
        stats = s if stats is None else jax.tree.map(jnp.maximum, stats, s)
    if stats is None:
        raise ValueError("calibrate() needs at least one batch")
    return jax.device_get(stats)


def _quantize_convbn(p, b, absmax: float, min_in_ch: int, bn_eps: float):
    """Fold BN into one ConvBnAct's kernel and quantize. Returns the quant
    entry dict, or None if the conv should stay float."""
    kernel = np.asarray(p["conv"]["kernel"], np.float64)  # (kh,kw,ci/g,co)
    if kernel.shape[2] < min_in_ch or not np.isfinite(absmax) or absmax <= 0:
        return None
    gamma = np.asarray(p["bn"]["scale"], np.float64)
    beta = np.asarray(p["bn"]["bias"], np.float64)
    mean = np.asarray(b["bn"]["mean"], np.float64)
    var = np.asarray(b["bn"]["var"], np.float64)
    f = gamma / np.sqrt(var + bn_eps)
    w = kernel * f                       # fold: conv then BN == conv(w*f)+bias
    bias = beta - mean * f
    wmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    wscale = np.where(wmax > 0, wmax / 127.0, 1.0)
    qkernel = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
    xscale = float(absmax) / 127.0
    return {
        "qkernel": jnp.asarray(qkernel),
        "xscale": jnp.float32(xscale),
        "scale": jnp.asarray((wscale * xscale).astype(np.float32)),
        "bias": jnp.asarray(bias.astype(np.float32)),
    }


def build_quant_collection(variables, quant_stats, *, min_in_ch: int = 8,
                           bn_eps: float = 1e-3):
    """Walk the calibration stats and build the ``quant`` collection.

    ``quant_stats`` marks exactly the ConvBnAct scopes that executed during
    calibration; params/batch_stats are indexed by the same scope paths, so
    the three trees are walked in lockstep."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def rec(p, b, q):
        if "in_absmax" in q:
            # this scope IS a ConvBnAct (model root is the block itself)
            return _quantize_convbn(
                p, b, float(q["in_absmax"]), min_in_ch, bn_eps) or {}
        out = {}
        for name, qchild in q.items():
            if not isinstance(qchild, dict):
                continue
            pchild = p.get(name, {}) if isinstance(p, dict) else {}
            bchild = b.get(name, {}) if isinstance(b, dict) else {}
            sub = rec(pchild, bchild, qchild)
            if sub:
                out[name] = sub
        return out

    return rec(params, bstats, quant_stats)


def quantize_for_inference(model, variables, calib_batches: Iterable, *,
                           min_in_ch: int = 8, bn_eps: float = 1e-3,
                           **apply_kwargs):
    """One-call PTQ: calibrate on ``calib_batches`` (model-input batches,
    i.e. normalized images for the detection models) and return ``variables``
    augmented with the ``quant`` collection.  Pass the result anywhere plain
    variables go (predict / evaluate / infer_fn)."""
    stats = calibrate(model, variables, calib_batches, **apply_kwargs)
    quant = build_quant_collection(
        variables, stats, min_in_ch=min_in_ch, bn_eps=bn_eps)
    return dict(variables, quant=quant)


def count_quantized(quant) -> int:
    """Number of convs on the int8 path (leaf entries in the collection)."""
    if not isinstance(quant, dict):
        return 0
    if "qkernel" in quant:
        return 1
    return sum(count_quantized(v) for v in quant.values())
