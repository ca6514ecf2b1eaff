"""Detection heads.

The reference's ``Detect`` (modules.py:407-456) branches its *forward shape*
on train/eval and owns DFL-decode + anchor caching inside the module. Here the
head is a pure network: it returns per-level raw maps ``(B, H, W, 4*reg_max+nc)``
and the decode (anchors, DFL softmax projection, dist2bbox) lives in
``tpucv.decode`` as standalone jittable functions — one traced forward serves
training and inference, which is what XLA wants.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.nn.blocks import ConvBnAct

Dtype = Any


class DetectHead(nn.Module):
    """YOLOv8 decoupled anchor-free head (reference modules.py:407-456).

    Per level: a box branch (two 3x3 ConvBnAct + 1x1 conv -> 4*reg_max) and a
    class branch (two 3x3 ConvBnAct + 1x1 conv -> nc). Bias initialisation
    matches the reference's ``bias_init`` (modules.py:448-456): box bias = 1.0,
    cls bias = log(5/nc/(640/stride)^2), which stabilises early training.
    """

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[jax.Array, ...]:
        # Frozen DFL projection vector — the reference keeps this as a
        # requires_grad=False conv weight (modules.py:67-83) and counts it in
        # the published parameter totals; we register it (stop-gradient'd in
        # decode) so param counts match exactly.
        self.param(
            "dfl_proj",
            lambda _key: jnp.arange(self.reg_max, dtype=jnp.float32),
        )
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            stride = self.strides[i]
            b = ConvBnAct(c2, 3, 1, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = ConvBnAct(c2, 3, 1, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True,
                bias_init=nn.initializers.constant(1.0),
                dtype=self.dtype, param_dtype=jnp.float32, name=f"cv2_{i}_2",
            )(b)
            c = ConvBnAct(c3, 3, 1, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            c = ConvBnAct(c3, 3, 1, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            cls_bias = math.log(5.0 / self.nc / (640.0 / stride) ** 2)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True,
                bias_init=nn.initializers.constant(cls_bias),
                dtype=self.dtype, param_dtype=jnp.float32, name=f"cv3_{i}_2",
            )(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return tuple(outs)


class SegmentHead(nn.Module):
    """Detect + mask-coefficient branches + Proto (reference ``Segment``,
    modules.py:459-482). Returns (det_maps, mask_coef_maps, prototypes)."""

    nc: int = 80
    n_masks: int = 32
    proto_ch: int = 256
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from tpucv.nn.blocks import ConvBnAct as _Conv, Proto

        det = DetectHead(self.nc, self.reg_max, self.strides,
                         dtype=self.dtype, name="detect")(feats, train)
        c4 = max(feats[0].shape[-1] // 4, self.n_masks)
        coefs = []
        for i, x in enumerate(feats):
            y = _Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = _Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.n_masks, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            coefs.append(y)
        protos = Proto(self.proto_ch, self.n_masks, dtype=self.dtype,
                       name="proto")(feats[0], train)
        return det, tuple(coefs), protos


class PoseHead(nn.Module):
    """Detect + keypoint branches (reference ``Pose``, modules.py:485-506)."""

    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from tpucv.nn.blocks import ConvBnAct as _Conv

        det = DetectHead(self.nc, self.reg_max, self.strides,
                         dtype=self.dtype, name="detect")(feats, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(feats[0].shape[-1] // 4, nk)
        kpts = []
        for i, x in enumerate(feats):
            y = _Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = _Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(nk, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            kpts.append(y)
        return det, tuple(kpts)


class ClassifyHead(nn.Module):
    """Image classification head (reference ``Classify``, modules.py:509-528)."""

    nc: int = 1000
    mid_ch: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tpucv.nn.blocks import ConvBnAct as _Conv

        x = _Conv(self.mid_ch, 1, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                        name="linear")(x)


def dfl_project(box_dist: jax.Array, reg_max: int = 16) -> jax.Array:
    """Distribution-Focal-Loss expectation decode (reference modules.py:67-83).

    The reference implements this as a frozen 1x1 conv over softmaxed bins; on
    TPU a softmax + dot with an iota vector fuses into the surrounding decode.

    Args:
      box_dist: (..., 4*reg_max) raw distances.
    Returns:
      (..., 4) expected l/t/r/b distances in stride units.
    """
    shape = box_dist.shape[:-1]
    x = box_dist.reshape(*shape, 4, reg_max)
    x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...r,r->...", x, proj)
