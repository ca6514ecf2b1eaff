"""Neural-net building blocks (flax.linen, NHWC, bf16-aware).

TPU-native re-designs of the reference's torch modules:
  * ``core/models/yolov8/modules.py`` (Conv/C2f/SPPF/Detect/DFL, ...)
  * ``core/models/yolov7_model.py`` (ELAN / RepConv / SPPCSPC)
  * ``core/models/centernet_model.py`` (DLA trees)
  * ``core/models/deeplabv3plus.py`` (ASPP)
"""

from tpucv.nn.blocks import (  # noqa: F401
    BottleneckCSP,
    C1,
    C2,
    C2f,
    C3,
    C3Ghost,
    C3TR,
    C3x,
    CBAM,
    ChannelAttention,
    ConvBnAct,
    ConvTransposeBnAct,
    DWConv,
    DWConvTranspose2d,
    Ensemble,
    Bottleneck,
    Focus,
    GhostBottleneck,
    GhostConv,
    Proto,
    SPP,
    SPPF,
    SpatialAttention,
    TransformerBlock,
    TransformerLayer,
    max_pool_same,
    upsample2x,
)
from tpucv.nn.heads import (  # noqa: F401
    ClassifyHead,
    DetectHead,
    PoseHead,
    SegmentHead,
    dfl_project,
)
