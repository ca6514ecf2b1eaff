"""Evaluate CLI — same flags as the reference (``evaluate.py:9-34``):
``python evaluate.py --model <name> --dataset voc|coco --ckpt <path>``.

Family-agnostic: each algorithm owns its dataset-index construction
(``build_eval_index``) and its eval entry (``run_eval``), so adding a model
family never touches this file (the reference hardcodes one eval path per
family inside ``core/metrics/eval.py:14-133``).
"""

import argparse

from tpucv.builder import export_from_registry
from tpucv.ckpt.checkpoint import CheckPoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None,
                        choices=["voc", "coco"])
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--subset", type=str, default="val")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--plots", action="store_true",
                        help="write per-class AP/F1/PR plots next to the "
                             "eval results (VOC protocol only; reference "
                             "mAP.py:208-300)")
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

    index = algo.build_eval_index(args.subset)
    if args.int8:
        if not hasattr(algo, "quantize_variables"):
            raise SystemExit(f"--int8 is not supported for {args.model}")
        variables = algo.quantize_variables(variables, index)
    kw = {"plots": True} if args.plots else {}
    algo.run_eval(variables, index, args.batch_size, **kw)


if __name__ == "__main__":
    main()
