"""YOLOv7 (l/x) detector, TPU-native.

Re-design of the reference network (``core/models/yolov7_model.py``): E-ELAN
backbone (Backbone :86-141, Multi_Concat_Block :28-52), Transition_Block
dual-path downsampling (:64-83), SPPCSPC (:144-163), RepConv with deploy-time
reparameterisation (:166-331), PAN head + 3 anchor heads (:355-461).

The network returns raw per-level maps (B, H, W, na*(5+nc)); anchor decode
lives in ``tpucv.decode.yolov7``. RepConv keeps its 3x3+1x1(+id) training
branches; ``fuse_repconv_params`` folds them into a single conv for deploy
(parity with reference ``fuse`` :452-461).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.nn.blocks import ConvBnAct, max_pool_same, upsample2x as _up2

Dtype = Any


class MultiConcat(nn.Module):
    """E-ELAN computation block (reference Multi_Concat_Block :28-52).

    cv1/cv2 are 1x1 to ``mid``; then ``n`` 3x3 convs of ``mid2`` channels;
    selected outputs (``ids`` into [cv1, cv2, o1..on]) concat into cv_out.
    """

    mid: int
    mid2: int
    out_ch: int
    n: int = 4
    ids: Tuple[int, ...] = (-1, -3, -5, -6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = ConvBnAct(self.mid, 1, dtype=self.dtype, name="cv1")(x, train)
        x2 = ConvBnAct(self.mid, 1, dtype=self.dtype, name="cv2")(x, train)
        outs = [x1, x2]
        y = x2
        for i in range(self.n):
            y = ConvBnAct(self.mid2, 3, dtype=self.dtype, name=f"cv3_{i}")(
                y, train)
            outs.append(y)
        sel = [outs[i] for i in self.ids]
        y = jnp.concatenate(sel, axis=-1)
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype, name="cv4")(y, train)


class Transition(nn.Module):
    """Dual-path downsample (reference Transition_Block :64-83): maxpool+1x1
    alongside 1x1+3x3(s2); concat -> 2*ch."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch MaxPool2d(2,2): no padding
        a = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            ((0, 0), (0, 0), (0, 0), (0, 0)))
        a = ConvBnAct(self.ch, 1, dtype=self.dtype, name="cv1")(a, train)
        b = ConvBnAct(self.ch, 1, dtype=self.dtype, name="cv2")(x, train)
        b = ConvBnAct(self.ch, 3, 2, dtype=self.dtype, name="cv3")(b, train)
        return jnp.concatenate([b, a], axis=-1)


class SPPCSPC(nn.Module):
    """CSP spatial pyramid pooling (reference :144-163)."""

    out_ch: int
    ks: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.out_ch
        y = ConvBnAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(c_, 3, dtype=self.dtype, name="cv3")(y, train)
        y = ConvBnAct(c_, 1, dtype=self.dtype, name="cv4")(y, train)
        pools = [y] + [max_pool_same(y, k) for k in self.ks]
        z = jnp.concatenate(pools, axis=-1)
        z = ConvBnAct(c_, 1, dtype=self.dtype, name="cv5")(z, train)
        z = ConvBnAct(c_, 3, dtype=self.dtype, name="cv6")(z, train)
        shortcut = ConvBnAct(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype, name="cv7")(
            jnp.concatenate([z, shortcut], axis=-1), train)


class RepConv(nn.Module):
    """Re-parameterisable conv (reference :166-331): train-time
    3x3BN + 1x1BN (+ identity BN when in==out), summed, SiLU."""

    out_ch: int
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = nn.Conv(self.out_ch, (3, 3), (self.s, self.s),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="dense_conv")(x)
        dense = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name="dense_bn")(dense)
        one = nn.Conv(self.out_ch, (1, 1), (self.s, self.s), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="one_conv")(x)
        one = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32, name="one_bn")(one)
        y = dense + one
        if x.shape[-1] == self.out_ch and self.s == 1:
            idn = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                               epsilon=1e-3, dtype=self.dtype,
                               param_dtype=jnp.float32, name="id_bn")(x)
            y = y + idn
        return nn.silu(y)


# per-phi structural constants, exactly the reference's parameterisation
# (yolov7_model.py:366-372): transition_channels tc, block_channels bc=32,
# panet_channels pc, head expansion e, conv count n, concat ids, head conv.
PHI = {
    "l": dict(tc=32, bc=32, pc=32, e=2, n=4,
              ids=(-1, -3, -5, -6), head_ids=(-1, -2, -3, -4, -5, -6),
              rep_head=True),
    "x": dict(tc=40, bc=32, pc=64, e=1, n=6,
              ids=(-1, -3, -5, -7, -8), head_ids=(-1, -3, -5, -7, -8),
              rep_head=False),
}


class Yolo7(nn.Module):
    """Returns raw maps [(B,H/8,W/8,na*(5+nc)), /16, /32]."""

    nc: int = 20
    na: int = 3
    phi: str = "l"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        p = PHI[self.phi]
        dt = self.dtype
        tc, bc, pc, e = p["tc"], p["bc"], p["pc"], p["e"]
        n, ids, hids = p["n"], p["ids"], p["head_ids"]

        # stem (reference Backbone :98-104)
        x = ConvBnAct(tc, 3, 1, dtype=dt, name="stem0")(x, train)
        x = ConvBnAct(tc * 2, 3, 2, dtype=dt, name="stem1")(x, train)   # /2
        x = ConvBnAct(tc * 2, 3, 1, dtype=dt, name="stem2")(x, train)
        x = ConvBnAct(tc * 4, 3, 2, dtype=dt, name="stem3")(x, train)   # /4

        # backbone ELAN stages (MCB hidden = block_channels multiples, e=1)
        x = MultiConcat(bc * 2, bc * 2, tc * 8, n, ids, dtype=dt,
                        name="elan1")(x, train)
        x = Transition(tc * 4, dtype=dt, name="mp1")(x, train)          # /8
        p3 = MultiConcat(bc * 4, bc * 4, tc * 16, n, ids, dtype=dt,
                         name="elan2")(x, train)
        x = Transition(tc * 8, dtype=dt, name="mp2")(p3, train)         # /16
        p4 = MultiConcat(bc * 8, bc * 8, tc * 32, n, ids, dtype=dt,
                         name="elan3")(x, train)
        x = Transition(tc * 16, dtype=dt, name="mp3")(p4, train)        # /32
        p5 = MultiConcat(bc * 8, bc * 8, tc * 32, n, ids, dtype=dt,
                         name="elan4")(x, train)

        # head (reference :388-420; MCB hidden = panet_channels * e)
        sppc = SPPCSPC(tc * 16, dtype=dt, name="sppcspc")(p5, train)
        up1 = ConvBnAct(tc * 8, 1, dtype=dt, name="up1_conv")(sppc, train)
        up1 = _up2(up1)
        l4 = ConvBnAct(tc * 8, 1, dtype=dt, name="p4_lat")(p4, train)
        h4 = MultiConcat(pc * 4 * e, pc * 4, tc * 8, n, hids, dtype=dt,
                         name="helan1")(jnp.concatenate([l4, up1], -1), train)
        up2 = ConvBnAct(tc * 4, 1, dtype=dt, name="up2_conv")(h4, train)
        up2 = _up2(up2)
        l3 = ConvBnAct(tc * 4, 1, dtype=dt, name="p3_lat")(p3, train)
        h3 = MultiConcat(pc * 2 * e, pc * 2, tc * 4, n, hids, dtype=dt,
                         name="helan2")(jnp.concatenate([l3, up2], -1), train)

        d3 = Transition(tc * 4, dtype=dt, name="down1")(h3, train)
        h4b = MultiConcat(pc * 4 * e, pc * 4, tc * 8, n, hids, dtype=dt,
                          name="helan3")(jnp.concatenate([d3, h4], -1), train)
        d4 = Transition(tc * 8, dtype=dt, name="down2")(h4b, train)
        h5 = MultiConcat(pc * 8 * e, pc * 8, tc * 16, n, hids, dtype=dt,
                         name="helan4")(jnp.concatenate([d4, sppc], -1), train)

        outs = []
        no = self.na * (5 + self.nc)
        for i, (f, ch) in enumerate(
                zip((h3, h4b, h5), (tc * 8, tc * 16, tc * 32))):
            if p["rep_head"]:
                y = RepConv(ch, dtype=dt, name=f"rep{i}")(f, train)
            else:  # 'x' uses a plain ConvBNSiLU before the head (:372)
                y = ConvBnAct(ch, 3, 1, dtype=dt, name=f"rep{i}")(f, train)
            y = nn.Conv(no, (1, 1), use_bias=True, dtype=dt,
                        param_dtype=jnp.float32, name=f"head{i}")(y)
            outs.append(y)
        return tuple(outs)



