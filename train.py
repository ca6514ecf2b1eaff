"""Train CLI — same flags as the reference (``train.py:7-16``):
``python train.py --model yolo8_det`` (+ optional --max-steps for smoke runs).
"""

import argparse

from tpucv.builder import export_from_registry


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True,
                        help="yolo7 | yolo8_det | ssd | centernet | deeplabv3plus")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--n-model", type=int, default=None,
                        help="model-axis size of the (data, model) mesh; "
                             ">1 channel-shards the largest conv kernels")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override cfg.train.batch_size")
    args = parser.parse_args()

    cfg, _algo, trainer_cls = export_from_registry(args.model)
    if args.n_model is not None:
        cfg.train.n_model = args.n_model
    if args.batch_size is not None:
        cfg.train.batch_size = args.batch_size
    trainer = trainer_cls(cfg)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
