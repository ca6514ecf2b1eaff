"""Post-training int8 quantization (PTQ) for inference.

The reference declares a deploy capability but ships empty stubs
(``core/deploy/onnx.py`` / ``core/deploy/tensorrt.py``, 0 LoC — SURVEY
§1.11); TensorRT's flagship deploy feature is int8 PTQ.  This module is the
TPU-native equivalent: v5e's MXU runs int8 at ~2x the bf16 rate, so the
conv-dominated detection forwards can roughly halve their MXU time.

Scheme (standard TensorRT-style PTQ):
  * weights: BatchNorm (and any conv bias) folded into the kernel/bias,
    then symmetric per-output-channel int8 (no zero points);
  * activations: symmetric per-tensor int8, scale calibrated as the running
    absolute maximum over calibration batches;
  * accumulation in int32 on the MXU, dequantize + bias + activation in
    f32/bf16 (fused by XLA into the conv epilogue).

Integration is transparent: ``quantize_for_inference`` returns the same
variables dict plus a ``quant`` collection; every hooked conv+BN pair that
finds its entry takes the int8 path, everything else (stems, depthwise,
plain heads, residual adds, decode) stays float.  The harness, predict CLI
and bench all accept the augmented variables unchanged.

Model blocks opt in by building their conv+BN pair through ``conv_bn``
(see ``nn/blocks.py ConvBnAct``, ``models/resnet.py BNConv``,
``models/centernet.py``, ``models/ssd.py``):

    y = quant.conv_bn(self, x, features=c, kernel=3, padding=1,
                      conv="conv", bn="bn", eps=1e-5, dtype=dt, train=train)
    return act(y)      # pre-activation output; float path if no quant entry

(``sow_calibration`` + ``quantized_conv`` remain available for blocks that
need the pieces separately.) Keys are ``"<conv_child>::<bn_child>::in_absmax"`` in the calibration
stats and ``"<conv_child>::qkernel|xscale|scale|bias"`` in the quant
collection, so several conv+BN pairs can live in one module scope and the
builder can find each pair's params/stats by name.

Skips: convs whose per-group input width is below ``min_in_ch`` (3-channel
stems and depthwise convs — MXU-hostile in int8 and accuracy-sensitive)
and convs never hit during calibration.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np

import jax
import jax.numpy as jnp

_PAIR_RE = re.compile(r"^(.+)::(.+)::in_absmax$")


# --------------------------------------------------------------------------
# module-side hooks
# --------------------------------------------------------------------------

def sow_calibration(module, x: jax.Array, *, conv: str = "conv",
                    bn: str = "bn", eps: float = 1e-5) -> None:
    """Record the input absmax (and the pair's BN epsilon) for one conv+BN
    pair during a calibration pass. No-op outside calibration."""
    if module.is_initializing() or \
            not module.is_mutable_collection("quant_stats"):
        return
    pre = f"{conv}::{bn}::"
    zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
    module.sow("quant_stats", pre + "in_absmax",
               jnp.max(jnp.abs(x)).astype(jnp.float32),
               init_fn=zero, reduce_fn=jnp.maximum)
    module.sow("quant_stats", pre + "eps", jnp.float32(eps),
               init_fn=zero, reduce_fn=jnp.maximum)


def quantized_conv(module, x: jax.Array, *, conv: str = "conv",
                   strides=(1, 1), padding=((0, 0), (0, 0)),
                   dilation=(1, 1), groups: int = 1, out_dtype=None):
    """int8 inference path for one conv+BN pair: symmetric per-tensor
    activation x symmetric per-output-channel weight (BN folded), int32
    accumulation on the MXU. Returns the PRE-activation output in
    ``out_dtype`` (the caller applies its own activation/residual), or
    None when no quant entry exists (caller runs the float path). The
    float params stay untouched so the same variables still serve both."""
    if not module.has_variable("quant", f"{conv}::qkernel"):
        return None
    qk = module.get_variable("quant", f"{conv}::qkernel")     # int8
    xscale = module.get_variable("quant", f"{conv}::xscale")  # () f32
    scale = module.get_variable("quant", f"{conv}::scale")    # (co,) xs*ws
    bias = module.get_variable("quant", f"{conv}::bias")      # (co,) folded
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / xscale)),
        -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, qk, strides, padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale + bias
    return y.astype(out_dtype) if out_dtype is not None else y


def conv_bn(module, x: jax.Array, *, features: int, kernel=1, strides=1,
            padding=0, dilation=1, groups: int = 1, use_bias: bool = False,
            conv: str = "conv", bn: str = "bn", eps: float = 1e-5,
            momentum: float = 0.9, dtype=jnp.float32, train: bool = False):
    """One conv+BN pair with the int8 PTQ hooks, returning the
    PRE-activation output (caller applies its own activation/residual).

    Call from inside ``@nn.compact`` — the float ``nn.Conv``/``nn.BatchNorm``
    submodules are created with the given names in the CALLER's scope, so
    the param tree is identical to writing them inline. During inference the
    pair sows calibration stats and takes the int8 path when its quant
    entry is present; training always runs the float path (BN batch stats).
    """
    from flax import linen as nn

    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    st = (strides, strides) if isinstance(strides, int) else tuple(strides)
    pd = ((padding, padding),) * 2 if isinstance(padding, int) \
        else tuple(padding)
    dl = (dilation, dilation) if isinstance(dilation, int) \
        else tuple(dilation)
    if not train:
        sow_calibration(module, x, conv=conv, bn=bn, eps=eps)
        q = quantized_conv(module, x, conv=conv, strides=st, padding=pd,
                           dilation=dl, groups=groups, out_dtype=dtype)
        if q is not None:
            return q
    y = nn.Conv(features, k, strides=st, padding=pd, kernel_dilation=dl,
                feature_group_count=groups, use_bias=use_bias, dtype=dtype,
                param_dtype=jnp.float32, name=conv)(x)
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=eps, dtype=dtype, param_dtype=jnp.float32,
                        name=bn)(y)


def conv_biased(module, x: jax.Array, *, features: int, kernel=1, strides=1,
                padding=0, dilation=1, conv: str = "conv",
                dtype=jnp.float32, train: bool = False, **conv_kwargs):
    """A plain biased conv (no BN) with the int8 PTQ hooks — pre-activation
    output; the bias quantizes into the dequant epilogue. Used for the
    reference nets' activation-conv stacks without BN (SSD's dilated
    conv6/conv7, CenterNet's 3x3 head convs)."""
    from flax import linen as nn

    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    st = (strides, strides) if isinstance(strides, int) else tuple(strides)
    pd = ((padding, padding),) * 2 if isinstance(padding, int) \
        else tuple(padding)
    dl = (dilation, dilation) if isinstance(dilation, int) \
        else tuple(dilation)
    if not train:
        sow_calibration(module, x, conv=conv, bn=NO_BN)
        q = quantized_conv(module, x, conv=conv, strides=st, padding=pd,
                           dilation=dl, out_dtype=dtype)
        if q is not None:
            return q
    return nn.Conv(features, k, strides=st, padding=pd, kernel_dilation=dl,
                   use_bias=True, dtype=dtype, param_dtype=jnp.float32,
                   name=conv, **conv_kwargs)(x)


# --------------------------------------------------------------------------
# offline calibration + builder
# --------------------------------------------------------------------------

def calibrate(model, variables, batches: Iterable, **apply_kwargs):
    """Run calibration batches through the model, collecting each hooked
    conv's input absolute maximum. Returns the ``quant_stats`` pytree."""

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


NO_BN = "@none"     # sentinel bn name for conv(+bias) pairs without BN


def _quantize_convbn(cp, bnp, bnb, absmax: float, min_in_ch: int,
                     bn_eps: float):
    """Fold one conv+BN pair and quantize. ``cp`` = conv params (kernel +
    optional bias), ``bnp``/``bnb`` = BN params / batch stats (both empty
    for a NO_BN pair). Returns the quant entries (unprefixed), or None if
    the conv should stay float."""
    kernel = np.asarray(cp["kernel"], np.float64)   # (kh,kw,ci/g,co)
    if kernel.shape[2] < min_in_ch or not np.isfinite(absmax) or absmax <= 0:
        return None
    cbias = np.asarray(cp["bias"], np.float64) if "bias" in cp else 0.0
    if bnp:
        gamma = np.asarray(bnp["scale"], np.float64)
        beta = np.asarray(bnp["bias"], np.float64)
        mean = np.asarray(bnb["mean"], np.float64)
        var = np.asarray(bnb["var"], np.float64)
        f = gamma / np.sqrt(var + bn_eps)
        w = kernel * f                 # fold: conv then BN == conv(w*f)+bias
        bias = beta + (cbias - mean) * f
    else:                              # plain biased conv (NO_BN)
        w = kernel
        bias = np.broadcast_to(np.asarray(cbias, np.float64),
                               (kernel.shape[-1],))
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


def build_quant_collection(variables, quant_stats, *, min_in_ch: int = 8):
    """Walk the calibration stats and build the ``quant`` collection.

    ``quant_stats`` marks exactly the conv+BN pairs that executed during
    calibration (keys ``<conv>::<bn>::in_absmax`` at their module scope);
    params/batch_stats are indexed by the same scope paths, so the trees
    are walked in lockstep."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def rec(p, b, q):
        out = {}
        for name, qchild in q.items():
            m = _PAIR_RE.match(name)
            if m:
                cname, bnname = m.group(1), m.group(2)
                eps = float(q.get(f"{cname}::{bnname}::eps", 1e-5))
                cp = p.get(cname) if isinstance(p, dict) else None
                if bnname == NO_BN:
                    bnp, bnb = {}, {}
                else:
                    bnp = p.get(bnname) if isinstance(p, dict) else None
                    bnb = b.get(bnname, {}) if isinstance(b, dict) else {}
                if not isinstance(cp, dict) or \
                        (bnname != NO_BN and not isinstance(bnp, dict)):
                    raise KeyError(
                        f"quant pair {cname}::{bnname} sown but params "
                        f"missing at the same scope")
                entry = _quantize_convbn(
                    cp, bnp, bnb, float(qchild), min_in_ch, eps)
                if entry is not None:
                    for k, v in entry.items():
                        out[f"{cname}::{k}"] = v
            elif isinstance(qchild, dict):
                pchild = p.get(name, {}) if isinstance(p, dict) else {}
                bchild = b.get(name, {}) if isinstance(b, dict) else {}
                sub = rec(pchild, bchild, qchild)
                if sub:
                    out[name] = sub
        return out

    return rec(params, bstats, quant_stats)


def quantize_for_inference(model, variables, calib_batches: Iterable, *,
                           min_in_ch: int = 8, **apply_kwargs):
    """One-call PTQ: calibrate on ``calib_batches`` (model-input batches,
    i.e. normalized images for the detection models) and return ``variables``
    augmented with the ``quant`` collection.  Pass the result anywhere plain
    variables go (predict / evaluate / infer_fn)."""
    stats = calibrate(model, variables, calib_batches, **apply_kwargs)
    quant = build_quant_collection(variables, stats, min_in_ch=min_in_ch)
    return dict(variables, quant=quant)


def count_quantized(quant) -> int:
    """Number of convs on the int8 path (qkernel entries)."""
    if not isinstance(quant, dict):
        return 0
    n = sum(1 for k in quant if k.endswith("::qkernel"))
    return n + sum(count_quantized(v) for v in quant.values()
                   if isinstance(v, dict))
