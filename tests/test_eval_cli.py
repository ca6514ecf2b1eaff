"""End-to-end eval harness on a file-backed synthetic COCO dataset: json
index -> disk reads -> batched TPU/CPU eval -> COCOeval (native or numpy)
12-metric summary. Locks the evaluate.py CLI contract without real COCO."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full 640^2 model forward on CPU


def _make_dataset(root, n=6):
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_coco.py",
         "--root", str(root), "--n", str(n)],
        check=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))


def test_evaluate_on_coco_synthetic_root(tmp_path):
    _make_dataset(tmp_path)
    from tpucv.builder import export_from_registry
    from tpucv.data.coco import COCOIndex

    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    index = COCOIndex(
        os.path.join(tmp_path, "annotations/instances_val2017.json"),
        os.path.join(tmp_path, "val2017"))
    assert len(index) == 6
    stats = algo.evaluate_on_coco(
        variables, index, batch_size=3,
        result_dir=str(tmp_path / "result"))
    # random-init weights: AP must be a number (0-ish), empty buckets -1,
    # and the detection dump must exist
    assert set(stats) >= {"AP", "AP50", "AR100"}
    assert all(-1.0 <= v <= 1.0 for v in stats.values())
    assert os.path.exists(tmp_path / "result" / "eval_results.json")
