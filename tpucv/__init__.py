"""tpucv — a TPU-native (JAX/XLA/Pallas/pjit) computer-vision framework.

Brand-new implementation of the capabilities of the PyTorch reference
``calmiLovesAI/ComputerVision.pytorch`` (see SURVEY.md): a registry-driven zoo
of detection/segmentation models (YOLOv8 n-x, YOLOv7 l/x, SSD300/512-VGG16,
CenterNet-DLA34, DeepLabV3+-ResNet101) with shared train/predict/evaluate CLIs.

Everything is designed TPU-first:
  * NHWC layouts, bf16 compute / f32 params, static shapes everywhere
  * models are pure flax modules returning raw feature maps; decode /
    post-processing are separate jittable functions (no train/eval forward
    branching as in the reference's ``Detect``)
  * target assignment runs in-graph (vmapped, fixed max_boxes) instead of in
    DataLoader workers
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding, not NCCL
"""

__version__ = "0.1.0"
