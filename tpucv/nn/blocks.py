"""Core convolutional blocks, flax.linen, NHWC, bf16-aware.

Capability parity with the reference's module zoo
(``/root/reference/core/models/yolov8/modules.py``) but re-designed for TPU:

  * NHWC everywhere — the native TPU conv layout (the reference is NCHW).
  * ``dtype`` threads a compute dtype (bf16 by default on TPU) while params
    stay f32; there is no GradScaler anywhere (bf16 needs none).
  * BatchNorm uses the reference's eps=1e-3 / torch-momentum=0.03
    (flax momentum = 0.97) so imported torch weights behave identically
    (reference: ``core/models/yolov8/torch_utils.py:14-16``).
  * Modules never branch on a training/eval flag for *shape* — decode lives
    outside the network so one jitted forward serves both paths.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """Same-shape padding for odd kernels (reference modules.py:14-20)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class ConvBnAct(nn.Module):
    """Conv2d + BatchNorm + SiLU (reference ``Conv``, modules.py:23-41)."""

    out_ch: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # quant.conv_bn carries the int8 PTQ hooks (tpucv/quant.py): the
        # reference has no quantized path (its deploy stubs are empty,
        # SURVEY §1.11); on TPU v5e the int8 MXU runs at 2x the bf16 rate,
        # so inference convs take an int8 fast path when a precomputed
        # 'quant' collection is supplied with the variables.
        from tpucv import quant

        x = quant.conv_bn(
            self, x, features=self.out_ch, kernel=self.k,
            strides=self.s, padding=autopad(self.k, self.p, self.d),
            dilation=self.d, groups=self.g, conv="conv", bn="bn",
            eps=1e-3, momentum=0.97, dtype=self.dtype, train=train)
        if self.act:
            x = nn.silu(x)
        return x


class DWConv(nn.Module):
    """Depthwise conv (reference modules.py:44-49)."""

    out_ch: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        import math

        g = math.gcd(x.shape[-1], self.out_ch)
        return ConvBnAct(
            self.out_ch, self.k, self.s, g=g, act=self.act, dtype=self.dtype
        )(x, train)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference modules.py:137-152)."""

    out_ch: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        y = ConvBnAct(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.out_ch, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(
            y, train
        )
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck, 2 convolutions, fast (reference modules.py:186-208).

    cv1 projects to 2*c hidden, split in two; n bottlenecks chain off the
    second half; everything concatenates into cv2.
    """

    out_ch: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.out_ch * self.e)
        y = ConvBnAct(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype,
                    name=f"m{i}",
                )(parts[-1], train)
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference modules.py:211-230)."""

    out_ch: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, k=(1, 3), e=1.0, dtype=self.dtype,
                name=f"m{i}",
            )(a, train)
        b = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv3")(y, train)


def max_pool_same(x: jax.Array, k: int, s: int = 1) -> jax.Array:
    """k x k max pool, stride s, SAME-style symmetric padding (NHWC)."""
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference modules.py:320-337)."""

    out_ch: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(y, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        y = jnp.concatenate([y, y1, y2, y3], axis=-1)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class SPP(nn.Module):
    """Classic SPP with parallel pools (reference modules.py:303-317)."""

    out_ch: int
    ks: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y] + [max_pool_same(y, k) for k in self.ks]
        y = jnp.concatenate(ys, axis=-1)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class Focus(nn.Module):
    """Space-to-depth stem (reference modules.py:340-354)."""

    out_ch: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return ConvBnAct(self.out_ch, self.k, self.s, dtype=self.dtype)(y, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference modules.py:357-369)."""

    out_ch: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.out_ch // 2
        y = ConvBnAct(c_, self.k, self.s, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, g=c_, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference modules.py:372-389)."""

    out_ch: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.out_ch // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="g1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dw")(
                y, train
            )
        y = GhostConv(self.out_ch, 1, 1, dtype=self.dtype, name="g2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype,
                        name="sdw")(x, train)
            sc = ConvBnAct(self.out_ch, 1, 1, act=False, dtype=self.dtype,
                           name="scv")(sc, train)
        else:
            sc = x if x.shape[-1] == self.out_ch else ConvBnAct(
                self.out_ch, 1, 1, act=False, dtype=self.dtype, name="scv")(x, train)
        return y + sc


class ChannelAttention(nn.Module):
    """Channel attention (reference modules.py:248-258)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc")(s)
        return x * nn.sigmoid(s)


class SpatialAttention(nn.Module):
    """Spatial attention (reference modules.py:261-273)."""

    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        pad = self.k // 2
        s = nn.Conv(1, (self.k, self.k), padding=((pad, pad), (pad, pad)),
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv")(s)
        return x * nn.sigmoid(s)


class CBAM(nn.Module):
    """Convolutional block attention (reference modules.py:276-285)."""

    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ChannelAttention(dtype=self.dtype, name="ca")(x)
        return SpatialAttention(self.k, dtype=self.dtype, name="sa")(x)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample, NHWC (reference uses nn.Upsample)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvTransposeBnAct(nn.Module):
    """Transposed conv + BN + SiLU (reference ``ConvTranspose``,
    modules.py:52-64)."""

    out_ch: int
    k: int = 2
    s: int = 2
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.ConvTranspose(
            self.out_ch, (self.k, self.k), strides=(self.s, self.s),
            padding="VALID", use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.silu(x) if self.act else x


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference modules.py:155-166)."""

    out_ch: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = ConvBnAct(self.out_ch, 3, 1, dtype=self.dtype, name=f"m{i}")(
                z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference modules.py:169-183)."""

    out_ch: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.out_ch * self.e)
        y = ConvBnAct(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train)


class C3x(C3):
    """C3 with cross (1,3)/(3,1) kernels (reference modules.py:233-240)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = _CrossBottleneck(c_, self.shortcut, dtype=self.dtype,
                                 name=f"m{i}")(a, train)
        b = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class _CrossBottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Conv(self.out_ch, (1, 3), padding=((0, 0), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(y)
        y = nn.silu(y)
        y = nn.Conv(self.out_ch, (3, 1), padding=((1, 1), (0, 0)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn2")(y)
        y = nn.silu(y)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class TransformerLayer(nn.Module):
    """Single transformer layer (reference modules.py:86-101)."""

    dim: int
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="attn")(x, x)
        x = x + y
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class TransformerBlock(nn.Module):
    """Vision-transformer block over a conv feature map
    (reference modules.py:104-121)."""

    out_ch: int
    heads: int = 4
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[-1] != self.out_ch:
            x = ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="conv")(
                x, train)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        pos = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="linear")(seq)
        seq = seq + pos
        for i in range(self.n):
            seq = TransformerLayer(c, self.heads, dtype=self.dtype,
                                   name=f"tr{i}")(seq)
        return seq.reshape(b, h, w, c)


class BottleneckCSP(nn.Module):
    """Classic CSP bottleneck (reference modules.py:124-152)."""

    out_ch: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        a = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="cv3")(a)
        b = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="cv2")(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        y = nn.silu(y)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv4")(
            y, train)


class Proto(nn.Module):
    """Mask prototype head for segmentation (reference modules.py:392-404)."""

    mid_ch: int = 256
    n_masks: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBnAct(self.mid_ch, 3, dtype=self.dtype, name="cv1")(x, train)
        x = upsample2x(x)
        x = ConvBnAct(self.mid_ch, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.n_masks, 1, dtype=self.dtype, name="cv3")(
            x, train)


class C3TR(C3):
    """C3 whose bottleneck chain is a TransformerBlock (reference
    modules.py:271-277)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a = TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m")(
            a, train)
        b = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class C3Ghost(C3):
    """C3 whose bottleneck chain is GhostBottlenecks (reference
    modules.py:280-286)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, dtype=self.dtype, name=f"m{i}")(a, train)
        b = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.out_ch, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class DWConvTranspose2d(nn.Module):
    """Depth-wise transposed conv, groups=gcd(c1, c2), with bias (reference
    modules.py:43-48). Lowered as a fractionally-strided grouped conv
    (lhs_dilation + flipped kernel), the form XLA tiles onto the MXU; output
    size follows torch's (H-1)*s - 2*p1 + k + p2 via asymmetric padding."""

    out_ch: int
    k: int = 1
    s: int = 1
    p1: int = 0     # input padding
    p2: int = 0     # output padding (extra rows/cols at bottom/right)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        c1 = x.shape[-1]
        g = math.gcd(c1, self.out_ch)
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.k, self.k, c1 // g, self.out_ch), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                       jnp.float32)
        lo = self.k - 1 - self.p1
        hi = lo + self.p2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w[::-1, ::-1].astype(self.dtype),
            window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g)
        return y + b.astype(y.dtype)


class Ensemble:
    """NMS-ensemble of detection models (reference modules.py:390-404):
    every member predicts on the same batch and the candidate boxes are
    concatenated so downstream NMS fuses them. Members are
    ``(apply_fn, variables)`` pairs whose outputs share every axis except
    the candidate axis (axis 1 in tpucv's (B, A, no) decode layout; the
    reference's dim-2 in its (B, no, A) layout)."""

    def __init__(self, members=(), axis: int = 1):
        self.members = list(members)
        self.axis = axis

    def append(self, apply_fn, variables):
        self.members.append((apply_fn, variables))

    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.members:
            raise ValueError("Ensemble has no members")
        outs = [fn(v, x) for fn, v in self.members]
        return jnp.concatenate(outs, axis=self.axis)
