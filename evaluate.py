"""Evaluate CLI — same flags as the reference (``evaluate.py:9-34``):
``python evaluate.py --model <name> --dataset voc|coco --ckpt <path>``.
"""

import argparse
import os

from tpucv.builder import export_from_registry
from tpucv.ckpt.checkpoint import CheckPoint
from tpucv.configs.dataset_cfg import get_dataset_cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None,
                        choices=["voc", "coco"])
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--subset", type=str, default="val")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--int8", action="store_true",
                        help="post-training int8 quantization: calibrate on "
                             "the first eval batches, then run the int8 "
                             "inference path (tpucv/quant.py)")
    args = parser.parse_args()

    cfg, algo_cls, _ = export_from_registry(args.model)
    if args.dataset:
        cfg.dataset.name = args.dataset
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    if args.ckpt:
        variables = CheckPoint.load_pure(args.ckpt, dict(variables))

    def maybe_quantize(variables, index):
        """--int8: one shared entry point with a clean error for models
        the int8 path doesn't cover (instead of an AttributeError or a
        silent float run)."""
        if not args.int8:
            return variables
        if not hasattr(algo, "quantize_variables"):
            raise SystemExit(f"--int8 is not supported for {args.model}")
        return algo.quantize_variables(variables, index)

    if cfg.dataset.name == "folder":        # classification (vit_cls)
        if args.int8:
            raise SystemExit(f"--int8 is not supported for {args.model}")
        from tpucv.data.classification_dataset import (
            ImageFolderIndex, SyntheticClsIndex)
        root = os.environ.get("TPUCV_CLS_ROOT", "")
        if root and os.path.isdir(os.path.join(root, args.subset)):
            # pin class ids to the TRAIN split's listing (what the
            # checkpoint's logits mean); a val tree with the same class
            # count but different names would otherwise silently score
            # images against the wrong logit
            classes = None
            if os.path.isdir(os.path.join(root, "train")):
                classes = ImageFolderIndex(root, "train").classes
            index = ImageFolderIndex(root, args.subset, classes=classes)
            if len(index.classes) != cfg.num_classes:
                raise SystemExit(
                    f"folder tree has {len(index.classes)} classes but the "
                    f"config (and checkpoint) use {cfg.num_classes}; set "
                    f"VitClsConfig.n_classes to match the dataset")
            algo.class_names = list(index.classes)
        else:
            print(f"TPUCV_CLS_ROOT {root!r} not found — synthetic data")
            index = SyntheticClsIndex(
                32, cfg.dataset.input_size, cfg.num_classes, seed=1)
        algo.evaluate(variables, index, args.batch_size)
        return

    ds = get_dataset_cfg(cfg.dataset.name)
    if cfg.model_name == "deeplabv3plus":   # semantic segmentation: mIoU
        from tpucv.data.loader import Loader, segmentation_collate
        from tpucv.data.segmentation_dataset import (
            SegmentationDataset, build_voc_seg_samples,
            synthetic_seg_samples)
        crop = cfg.arch.crop_size
        if os.path.isdir(os.path.join(ds["root"], "SegmentationClass")):
            samples = build_voc_seg_samples(ds["root"], args.subset)
        else:
            print(f"dataset root {ds['root']!r} not found — synthetic "
                  f"seg data")
            samples = synthetic_seg_samples(8, crop, cfg.num_classes, 1)
        variables = maybe_quantize(variables, samples)
        loader = Loader(SegmentationDataset(samples, crop, train=False),
                        args.batch_size, shuffle=False,
                        collate=segmentation_collate)
        algo.evaluate_on_voc(variables, loader)
        return
    if cfg.model_name == "yolo8_pose":      # person keypoints + OKS mAP
        from tpucv.data.pose_dataset import (COCOKeypointIndex,
                                             SyntheticPoseIndex)
        ann = os.path.join(
            ds["root"], f"annotations/person_keypoints_{args.subset}2017.json")
        img_root = os.path.join(ds["root"], f"{args.subset}2017")
        if os.path.isfile(ann) and os.path.isdir(img_root):
            index = COCOKeypointIndex(ann, img_root)
        else:
            print(f"person_keypoints not found under {ds['root']!r} — "
                  f"synthetic pose data")
            index = SyntheticPoseIndex(
                16, cfg.dataset.input_size,
                nk=cfg.arch.kpt_shape[0], seed=1)
        variables = maybe_quantize(variables, index)
        algo.evaluate_on_coco(variables, index, args.batch_size)
        return
    if cfg.dataset.name == "coco":
        from tpucv.data.coco import COCOIndex
        index = COCOIndex(
            os.path.join(ds["root"], f"annotations/instances_{args.subset}2017.json"),
            os.path.join(ds["root"], f"{args.subset}2017"))
        variables = maybe_quantize(variables, index)
        algo.evaluate_on_coco(variables, index, args.batch_size)
    else:
        from tpucv.data.voc import VOCDetectionIndex
        index = VOCDetectionIndex(ds["root"], args.subset)
        variables = maybe_quantize(variables, index)
        algo.evaluate_on_voc(variables, index, args.batch_size)


if __name__ == "__main__":
    main()
