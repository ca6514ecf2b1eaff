"""Loader tests: thread vs multiprocess equivalence, worker-count
invariance, shared-memory lifecycle. Replaces what the reference delegates
to torch DataLoader num_workers (``core/data/collate.py`` call sites)."""

import numpy as np
import pytest

from tpucv.data.detection_dataset import (DetectionDataset,
                                          SyntheticDetectionIndex)
from tpucv.data.loader import Loader, detection_collate


def SyntheticDetectionDataset(num_samples, image_size, seed):
    return DetectionDataset(
        SyntheticDetectionIndex(n=num_samples, image_size=image_size,
                                seed=seed),
        input_size=image_size, max_boxes=8, seed=seed)


def _collect(loader, n=None):
    out = []
    for i, b in enumerate(loader):
        out.append({k: v.copy() for k, v in b.items()})
        if n is not None and i + 1 >= n:
            break
    return out


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)


@pytest.mark.parametrize("num_workers", [1, 2, 3])
def test_mp_matches_thread(num_workers):
    ds = SyntheticDetectionDataset(num_samples=13, image_size=64, seed=3)
    kw = dict(batch_size=4, shuffle=True, seed=7, drop_last=True)
    ref = _collect(Loader(ds, **kw))
    got = _collect(Loader(ds, num_workers=num_workers, **kw))
    _assert_batches_equal(ref, got)


def test_device_aug_host_aug_key_through_mp_loader():
    """device_aug samples carry a 4th host_aug element; the collate turns
    it into a (B,) bool key that must survive the shared-memory worker path
    identically to the thread path (mosaic flags drive aug neutralisation
    in the trainer, so a wrong flag silently double-augments)."""
    def make():
        return DetectionDataset(
            SyntheticDetectionIndex(n=12, image_size=64, seed=5),
            input_size=64, max_boxes=8, seed=5, train=True,
            mosaic_prob=0.5, device_aug=True)

    kw = dict(batch_size=4, shuffle=True, seed=2, drop_last=True)
    ref = _collect(Loader(make(), **kw))
    got = _collect(Loader(make(), num_workers=2, **kw))
    assert all("host_aug" in b and b["host_aug"].dtype == bool for b in ref)
    # mosaic_prob=0.5 over 12 samples: both flag values should occur
    flags = np.concatenate([b["host_aug"] for b in ref])
    assert flags.any() and not flags.all()
    _assert_batches_equal(ref, got)


def test_epoch_reshuffle_and_set_epoch():
    ds = SyntheticDetectionDataset(num_samples=16, image_size=64, seed=0)
    ld = Loader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    e0 = _collect(ld)
    ld.set_epoch(1)
    e1 = _collect(ld)
    ld.set_epoch(0)
    e0b = _collect(ld)
    _assert_batches_equal(e0, e0b)
    assert not np.array_equal(e0[0]["images"], e1[0]["images"])


def test_early_break_cleans_up():
    ds = SyntheticDetectionDataset(num_samples=32, image_size=64, seed=0)
    ld = Loader(ds, batch_size=4, num_workers=2)
    _collect(ld, n=2)           # abandon mid-epoch
    # iterating again must still work (fresh workers, no leaked shm)
    assert len(_collect(ld)) == 8


def test_copy_batches_detaches():
    ds = SyntheticDetectionDataset(num_samples=8, image_size=64, seed=0)
    ld = Loader(ds, batch_size=4, num_workers=1, copy_batches=True)
    batches = list(ld)
    # with copies, earlier batches stay intact after the epoch finishes
    assert batches[0]["images"].shape == (4, 64, 64, 3)
    assert batches[0]["images"].base is None or batches[0]["images"].flags.owndata


def test_worker_death_raises():
    class Bomb:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                import os
                os._exit(3)
            s = SyntheticDetectionDataset(num_samples=8, image_size=32, seed=0)
            return s[i]

    ld = Loader(Bomb(), batch_size=4, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="died"):
        _collect(ld)


def test_mp_ragged_final_batch():
    """drop_last=False with len(ds) % batch != 0: the mp path must deliver
    the short final batch instead of crashing the worker."""
    ds = SyntheticDetectionDataset(num_samples=10, image_size=64, seed=0)
    kw = dict(batch_size=4, shuffle=False, drop_last=False)
    ref = _collect(Loader(ds, **kw))
    got = _collect(Loader(ds, num_workers=2, **kw))
    assert [b["images"].shape[0] for b in got] == [4, 4, 2]
    _assert_batches_equal(ref, got)
