"""Config schema — dataclass mirror of the reference's nested config classes
(``configs/*_cfg.py``: sub-objects arch / dataset / train / loss / optimizer /
log / decode). Editing the Python config remains the workflow; argparse only
carries identity flags, exactly like the reference (SURVEY.md §5.6)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclass
class DatasetCfg:
    name: str = "coco"                  # "voc" | "coco"
    input_size: int = 640               # square model input
    max_num_boxes: int = 100            # static GT pad per image
    num_workers: int = 0                # >0: forked shm loader workers
                                        # (reference default is also 0)


@dataclass
class TrainCfg:
    epochs: int = 100
    batch_size: int = 16
    mixed_precision: bool = True        # bf16 on TPU; no GradScaler needed
    resume_training: bool = False
    last_epoch: int = -1
    eval_interval: int = 10
    save_interval: int = 10
    # in-training detection mAP on the val split every eval_interval epochs
    # (beats the reference's val-loss-only loop, yolo8_train.py:113-129)
    eval_map: bool = False
    eval_map_conf: float = 0.01     # conf floor for the in-training pass
    save_path: str = "saves"
    pretrained_weights: str = ""
    mosaic_prob: float = 0.5
    special_aug_ratio: float = 0.7
    device_aug: bool = True      # affine/flip/HSV on-chip (fused with step)
    # model-axis size of the (data, model) mesh: >1 channel-shards the
    # largest conv kernels (tpucv/parallel/mesh.py param_sharding_rule) —
    # useful for the l/x scales when replicated params+opt state crowd HBM
    n_model: int = 1
    # ZeRO-1: shard adam moments over the data axis (the largest replicated
    # training state, 2x params in f32) — per-chip optimizer HBM drops
    # ~n_data-fold; XLA inserts the reduce-scatter/all-gather pair
    zero_opt: bool = False
    # gradient accumulation: split each batch into G sequential micro-
    # batches inside the jitted step (activation memory / G at the same
    # effective batch); batch_size must be divisible by G
    grad_accum: int = 1


@dataclass
class OptimizerCfg:
    name: str = "adam"
    lr: float = 1e-3
    weight_decay: float = 0.0
    warmup_iters: int = 1000
    milestones: Tuple[int, ...] = ()    # epochs; converted to iters by trainer
    gamma: float = 0.1
    ema_decay: float = 0.0              # 0 disables (reference never enables)


@dataclass
class LogCfg:
    root: str = "log"
    print_interval: int = 50
    tensorboard_on: bool = True
    tensorboard_dir: str = "runs"


@dataclass
class DecodeCfg:
    conf_threshold: float = 0.25
    iou_threshold: float = 0.7
    max_det: int = 300
    # candidate cap before NMS. The reference floods up to max_nms=30000 at
    # eval conf=0.001 (ultralytics_ops.py:166); 4096 top-by-score candidates
    # cover realistic post-gate survivor counts while keeping static shapes
    # (k > 1024 routes to the memory-light scan NMS in decode_boxes)
    pre_nms_topk: int = 4096


@dataclass
class BaseConfig:
    """Every model config carries the same sub-object schema."""

    arch: Any = None
    dataset: DatasetCfg = field(default_factory=DatasetCfg)
    train: TrainCfg = field(default_factory=TrainCfg)
    loss: Any = None
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)
    log: LogCfg = field(default_factory=LogCfg)
    decode: DecodeCfg = field(default_factory=DecodeCfg)

    @property
    def model_name(self) -> str:
        raise NotImplementedError
