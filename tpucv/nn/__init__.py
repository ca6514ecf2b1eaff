"""Neural-net building blocks (flax.linen, NHWC, bf16-aware).

TPU-native re-designs of the reference's torch modules:
  * ``core/models/yolov8/modules.py`` (Conv/C2f/SPPF/Detect/DFL, ...)
  * ``core/models/yolov7_model.py`` (ELAN / RepConv / SPPCSPC)
  * ``core/models/centernet_model.py`` (DLA trees)
  * ``core/models/deeplabv3plus.py`` (ASPP)
"""

from tpucv.nn.blocks import (  # noqa: F401
    ConvBnAct,
    DWConv,
    Bottleneck,
    C2f,
    C3,
    SPPF,
    SPP,
    Focus,
    GhostConv,
    GhostBottleneck,
    ChannelAttention,
    SpatialAttention,
    CBAM,
    max_pool_same,
    upsample2x,
)
from tpucv.nn.heads import DetectHead, dfl_project  # noqa: F401
