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
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.out_ch,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
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
