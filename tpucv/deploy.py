"""Deployment / export.

The reference declares ONNX/TensorRT deploy intent with two empty files
(``core/deploy/{onnx,tensorrt}.py``, 0 LoC — SURVEY §1.11). The TPU-native
equivalent is real: AOT compilation and StableHLO export of the jitted
inference function, plus RepConv folding for deploy-time fusion.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def aot_compile(fn, *example_args):
    """Ahead-of-time compile a jittable fn; returns the compiled executable
    (serialisable, shape-locked)."""
    return jax.jit(fn).lower(*example_args).compile()


def export_stablehlo(fn, *example_args) -> str:
    """StableHLO text of the lowered inference graph — the portable exchange
    format (the ONNX analogue for the XLA ecosystem)."""
    return jax.jit(fn).lower(*example_args).as_text()


def export_serialized(fn, *example_args) -> bytes:
    """Versioned, portable serving artifact: serialized StableHLO with
    calling convention (jax.export). The bytes can be shipped to a serving
    host and rehydrated with ``load_serialized`` (or consumed by any
    StableHLO runtime) without the model-building Python code — the working
    analogue of the reference's empty onnx/tensorrt deploy stubs."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    return bytes(exported.serialize())


def load_serialized(data: bytes):
    """Rehydrate an ``export_serialized`` artifact into a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(data)
    return lambda *args: exported.call(*args)


def fuse_repconv_params(dense_k, dense_bn, one_k, one_bn, id_bn=None):
    """Fold RepConv's 3x3 + 1x1 (+identity) BN branches into a single 3x3
    conv (kernel HWIO, bias) — deploy-time reparameterisation, parity with
    reference ``RepConv.fuse_repvgg_block`` (yolov7_model.py:243-331).

    Each *_bn is a dict with scale/bias (params) and mean/var (stats).
    """

    def fold(k, bn):
        std = np.sqrt(np.asarray(bn["var"]) + 1e-3)
        t = np.asarray(bn["scale"]) / std
        k = np.asarray(k) * t[None, None, None, :]
        b = np.asarray(bn["bias"]) - np.asarray(bn["mean"]) * t
        return k, b

    k3, b3 = fold(dense_k, dense_bn)
    k1, b1 = fold(one_k, one_bn)
    k1_pad = np.zeros_like(k3)
    k1_pad[1:2, 1:2] = k1
    k, b = k3 + k1_pad, b3 + b1
    if id_bn is not None:
        cin = k3.shape[2]
        ident = np.zeros_like(k3)
        for i in range(cin):
            ident[1, 1, i, i] = 1.0
        ki, bi = fold(ident, id_bn)
        k, b = k + ki, b + bi
    return k, b
