"""CenterNet with DLA-34 backbone, TPU-native.

Re-design of the reference (``core/models/centernet_model.py``): full DLA-34
(recursive Tree/Root aggregation :81-222), DLAUp/IDAUp upsampling (:233-307,
deformable-free there too), and the multi-head output {heatmap: C, wh: 2,
reg: 2} concatenated to (B, H/4, W/4, C+4) (:365-379).

Deltas for TPU: NHWC; the IDAUp transposed-conv-with-bilinear-init upsample is
replaced by bilinear resize + 3x3 conv (same function, simpler XLA graph);
heatmap head bias initialised to -2.19 like the reference so sigmoid starts
near 0.1.
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
        p = self.k // 2
        x = nn.Conv(self.feat, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    feat: int
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        y = ConvBNReLU(self.feat, 3, self.s, dtype=self.dtype, name="cv1")(
            x, train)
        y = nn.Conv(self.feat, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv2_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="cv2_bn")(y)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv BN (+child0 residual)
    (reference centernet_model.py:81-103)."""

    feat: int
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jax.Array], train: bool = False):
        x = jnp.concatenate(list(children), axis=-1)
        x = nn.Conv(self.feat, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
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
            proj = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="project_conv")(bottom)
            proj = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="project_bn")(proj)
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


def _resize2x(x: jax.Array, factor: int) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "bilinear")


class IDAUp(nn.Module):
    """Iterative deep aggregation: project + upsample + node-merge
    (reference centernet_model.py:233-268)."""

    out_ch: int
    up_factors: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], train: bool = False):
        layers = list(layers)
        for i in range(1, len(layers)):
            x = ConvBNReLU(self.out_ch, 3, 1, dtype=self.dtype,
                           name=f"proj_{i}")(layers[i], train)
            if self.up_factors[i] > 1:
                x = _resize2x(x, self.up_factors[i])
            x = ConvBNReLU(self.out_ch, 3, 1, dtype=self.dtype,
                           name=f"node_{i}")(x + layers[i - 1], train)
            layers[i] = x
        return layers


class DLAUp(nn.Module):
    """Full pyramid aggregation (reference centernet_model.py:271-307)."""

    channels: Sequence[int]           # e.g. (64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], train: bool = False):
        layers = list(layers)
        out = [layers[-1]]
        for i in range(len(layers) - 1):
            # merge the top (len-1-i)..end levels down one scale
            sub = layers[len(layers) - 2 - i:]
            ida = IDAUp(self.channels[len(layers) - 2 - i],
                        [1] + [2] * (len(sub) - 1), dtype=self.dtype,
                        name=f"ida_{i}")
            sub = ida(sub, train)
            layers[len(layers) - 2 - i:] = sub
            out.insert(0, sub[-1])
        return out


class CenterNet(nn.Module):
    """Heads on the stride-4 aggregated feature; output (B, H/4, W/4, C+4) =
    [heatmap logits, wh, reg]."""

    num_classes: int = 20
    head_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        feats = DLA34(dtype=self.dtype, name="dla")(x, train)
        # first_level = 2 (stride 4); aggregate levels 2..5
        sub = feats[2:]
        ch = DLA34_CHANNELS[2:]
        sub = DLAUp(ch, dtype=self.dtype, name="dla_up")(sub, train)
        # final IDA to stride 4 over the 3 finest outputs
        y = IDAUp(ch[0], [1, 2, 4], dtype=self.dtype, name="ida_final")(
            sub[:3], train)[-1]

        def head(name, n_out, bias_init=0.0):
            h = ConvBNReLU(self.head_channels, 3, 1, dtype=self.dtype,
                           name=f"{name}_0")(y, train)
            return nn.Conv(
                n_out, (1, 1), use_bias=True,
                bias_init=nn.initializers.constant(bias_init),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{name}_1")(h)

        hm = head("hm", self.num_classes, bias_init=-2.19)
        wh = head("wh", 2)
        reg = head("reg", 2)
        return jnp.concatenate([hm, wh, reg], axis=-1)
