"""CenterNet with DLA-34 backbone, TPU-native.

Re-design of the reference (``core/models/centernet_model.py``): full DLA-34
(recursive Tree/Root aggregation :81-222), DLAUp/IDAUp upsampling (:233-307,
deformable-free there too), and the multi-head output {heatmap: C, wh: 2,
reg: 2} concatenated to (B, H/4, W/4, C+4) (:365-379).

Deltas for TPU: NHWC; the IDAUp grouped transposed conv is kept faithfully
(``DepthwiseUp`` below: fractionally-strided depthwise conv with bilinear
init, golden-tested against torch ConvTranspose2d); heatmap head bias
initialised to -2.19 like the reference so sigmoid starts near 0.1.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


class ConvBNReLU(nn.Module):
    feat: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # int8 PTQ hooks ride in quant.conv_bn (tpucv/quant.py)
        from tpucv import quant

        x = quant.conv_bn(self, x, features=self.feat, kernel=self.k,
                          strides=self.s, padding=self.k // 2,
                          dtype=self.dtype, train=train)
        return nn.relu(x)


class BasicBlock(nn.Module):
    feat: int
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        from tpucv import quant

        y = ConvBNReLU(self.feat, 3, self.s, dtype=self.dtype, name="cv1")(
            x, train)
        y = quant.conv_bn(self, y, features=self.feat, kernel=3, padding=1,
                          conv="cv2_conv", bn="cv2_bn", dtype=self.dtype,
                          train=train)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv BN (+child0 residual)
    (reference centernet_model.py:81-103)."""

    feat: int
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jax.Array], train: bool = False):
        from tpucv import quant

        x = jnp.concatenate(list(children), axis=-1)
        x = quant.conv_bn(self, x, features=self.feat, kernel=1,
                          dtype=self.dtype, train=train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive deep-aggregation tree (reference centernet_model.py:105-162)."""

    levels: int
    in_ch: int
    out_ch: int
    s: int = 1
    level_root: bool = False
    root_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = list(children) if children else []
        root_dim = self.root_dim or 2 * self.out_ch
        if self.level_root:
            root_dim += self.in_ch

        # bottom: strided identity for residuals / root children
        bottom = nn.max_pool(x, (self.s, self.s), (self.s, self.s)) \
            if self.s > 1 else x
        if self.in_ch != self.out_ch:
            from tpucv import quant

            proj = quant.conv_bn(self, bottom, features=self.out_ch,
                                 kernel=1, conv="project_conv",
                                 bn="project_bn", dtype=self.dtype,
                                 train=train)
        else:
            proj = bottom
        # reference semantics (centernet_model.py:134-141): every Tree
        # recomputes its own residual from its own project, IGNORING any
        # passed-in residual — an outer tree's project output is dead (its
        # params still exist and count, matching the reference exactly).
        residual = proj
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.out_ch, self.s, dtype=self.dtype,
                            name="tree1")(x, residual, train)
            x2 = BasicBlock(self.out_ch, 1, dtype=self.dtype,
                            name="tree2")(x1, None, train)
            return Root(self.out_ch, dtype=self.dtype, name="root")(
                [x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.in_ch, self.out_ch, self.s,
                  dtype=self.dtype, name="tree1")(x, None, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_ch, self.out_ch, 1,
                    root_dim=root_dim + self.out_ch, dtype=self.dtype,
                    name="tree2")(x1, None, children, train)


class DLA34(nn.Module):
    """Returns features at strides 1..32 (levels 0..5)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        ch = DLA34_CHANNELS
        y = ConvBNReLU(ch[0], 7, 1, dtype=self.dtype, name="base")(x, train)
        outs = []
        y = ConvBNReLU(ch[0], 3, 1, dtype=self.dtype, name="level0")(y, train)
        outs.append(y)
        y = ConvBNReLU(ch[1], 3, 2, dtype=self.dtype, name="level1")(y, train)
        outs.append(y)
        y = Tree(1, ch[1], ch[2], 2, False, dtype=self.dtype,
                 name="level2")(y, train=train)
        outs.append(y)
        y = Tree(2, ch[2], ch[3], 2, True, dtype=self.dtype,
                 name="level3")(y, train=train)
        outs.append(y)
        y = Tree(2, ch[3], ch[4], 2, True, dtype=self.dtype,
                 name="level4")(y, train=train)
        outs.append(y)
        y = Tree(1, ch[4], ch[5], 2, True, dtype=self.dtype,
                 name="level5")(y, train=train)
        outs.append(y)
        return outs


def _bilinear_up_init(key, shape, dtype=jnp.float32):
    """Classic DLA bilinear-upsample kernel, replicated per channel.
    shape: (k, k, 1, C) HWIO for a depthwise kernel."""
    k = shape[0]
    f = (k + 1) // 2
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    idx = jnp.arange(k, dtype=jnp.float32)
    w1d = 1.0 - jnp.abs(idx / f - c)
    w2d = w1d[:, None] * w1d[None, :]
    return jnp.broadcast_to(w2d[:, :, None, None], shape).astype(dtype)


class DepthwiseUp(nn.Module):
    """Grouped (depthwise) transposed conv, kernel 2f, stride f, padding f/2,
    groups=C, bias-free — exactly the reference IDAUp ``up`` op
    (centernet_model.py:255-257). Implemented as a fractionally-strided
    depthwise conv (lhs_dilation=f, spatially flipped kernel), which is the
    lowering XLA prefers on TPU anyway. Kernel layout (k, k, 1, C) matches
    torch's (C, 1, k, k) per-channel weights transposed, so import is a
    reshape+transpose (no flip stored — we flip at call time)."""

    ch: int
    f: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = 2 * self.f
        w = self.param("kernel", _bilinear_up_init, (k, k, 1, self.ch))
        pad = k - 1 - self.f // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w[::-1, ::-1].astype(self.dtype),
            window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.f, self.f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.ch)


class IDAUp(nn.Module):
    """Iterative deep aggregation (reference centernet_model.py:233-281):
    per input, 1x1 proj (identity when channels already match) + grouped
    ConvTranspose upsample; then sequential concat->3x3 node merges."""

    out_ch: int
    channels: Sequence[int]
    up_factors: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], train: bool = False):
        layers = list(layers)
        for i, c in enumerate(self.channels):
            x = layers[i]
            if c != self.out_ch:
                x = ConvBNReLU(self.out_ch, 1, 1, dtype=self.dtype,
                               name=f"proj_{i}")(x, train)
            f = int(self.up_factors[i])
            if f > 1:
                x = DepthwiseUp(self.out_ch, f, dtype=self.dtype,
                                name=f"up_{i}")(x)
            layers[i] = x
        x = layers[0]
        ys = []
        for i in range(1, len(layers)):
            x = ConvBNReLU(self.out_ch, 3, 1, dtype=self.dtype,
                           name=f"node_{i}")(
                jnp.concatenate([x, layers[i]], axis=-1), train)
            ys.append(x)
        return x, ys


class DLAUp(nn.Module):
    """Full pyramid aggregation (reference centernet_model.py:284-307),
    including its in_channels/scales bookkeeping so module shapes and names
    line up 1:1 for weight import."""

    channels: Sequence[int]           # e.g. (64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], train: bool = False):
        layers = list(layers)
        n = len(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = [2 ** i for i in range(n)]
        x = layers[-1]
        for i in range(n - 1):
            j = -i - 2
            ida = IDAUp(channels[j], tuple(in_channels[j:]),
                        tuple(s // scales[j] for s in scales[j:]),
                        dtype=self.dtype, name=f"ida_{i}")
            x, y = ida(layers[j:], train)
            layers[-i - 1:] = y
            scales[j + 1:] = [scales[j]] * (-j - 1)
            in_channels[j + 1:] = [channels[j]] * (-j - 1)
        return x


class CenterNet(nn.Module):
    """DLASeg equivalent (reference centernet_model.py:310-379): DLA-34 ->
    DLAUp from first_level=2 (stride 4) -> three heads, concatenated to
    (B, H/4, W/4, C+4) in the reference's [heatmap, wh, reg] order. Heads
    are conv3x3(+bias) -> ReLU -> conv1x1(+bias), no BN (:323-331)."""

    num_classes: int = 20
    head_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        feats = DLA34(dtype=self.dtype, name="dla")(x, train)
        # first_level = 2 (stride 4); aggregate levels 2..5
        y = DLAUp(DLA34_CHANNELS[2:], dtype=self.dtype, name="dla_up")(
            feats[2:], train)

        from tpucv import quant

        def head(name, n_out, bias_init=0.0):
            # the 3x3 neck of each head quantizes (quant.conv_biased, int8
            # hooks); the final 1x1 regression conv stays float
            h = quant.conv_biased(
                self, y, features=self.head_channels, kernel=3, padding=1,
                conv=f"{name}_0", dtype=self.dtype, train=train)
            h = nn.relu(h)
            return nn.Conv(
                n_out, (1, 1), use_bias=True,
                bias_init=nn.initializers.constant(bias_init),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{name}_1")(h)

        # hm bias -2.19 so sigmoid starts near 0.1 (focal stability); the
        # imported reference bias overwrites this, so parity is unaffected
        hm = head("hm", self.num_classes, bias_init=-2.19)
        wh = head("wh", 2)
        reg = head("reg", 2)
        return jnp.concatenate([hm, wh, reg], axis=-1)
