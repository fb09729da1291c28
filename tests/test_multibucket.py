"""Orientation-bucketed loader: portrait inputs (VERDICT r3 #2).

The reference batches any aspect ratio (faster_rcnn.py:163-164) and groups
batches by aspect (train.py:103). The rebuild keeps static shapes by using
exactly TWO buckets — landscape (min, max) and portrait (max, min) — with
orientation-homogeneous batches, so a mixed dataset like Pascal VOC runs
with exactly two jit variants instead of crashing the landscape assert.
"""

import numpy as np
import pytest

from snn_automotive_object_detection_tpu.data.coco import CocoDataset
from snn_automotive_object_detection_tpu.data.loader import DetectionLoader
from snn_automotive_object_detection_tpu.evaluation.coco_metrics import COCOEval
from tests.mini_dataset import make_mini_env

# 3 landscape + 3 portrait, pascal-style mixed set.
MIXED_SIZES = [(128, 256), (200, 100), (100, 200), (256, 128),
               (150, 300), (300, 150)]


class FakeDataset:
    """In-memory mixed-orientation dataset speaking the loader protocol."""

    def __init__(self, sizes, seed=0):
        self.sizes = list(sizes)
        self.rng = np.random.default_rng(seed)
        self.images = [
            (self.rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            for h, w in self.sizes
        ]

    def __len__(self):
        return len(self.sizes)

    def get_height_and_width(self, i):
        return self.sizes[i]

    def __getitem__(self, i):
        h, w = self.sizes[i]
        target = {
            "boxes": np.asarray([[w * 0.1, h * 0.1, w * 0.6, h * 0.7]],
                                np.float32),
            "labels": np.asarray([1], np.int64),
            "image_id": i,
        }
        return self.images[i], target


def test_batches_orientation_homogeneous():
    ds = FakeDataset(MIXED_SIZES)
    loader = DetectionLoader(ds, batch_size=2, bucket=(64, 128),
                             min_size=64, max_size=128, num_workers=2)
    shapes = set()
    seen = []
    for b in loader:
        shapes.add(b["images"].shape[1:3])
        seen.extend(np.asarray(b["image_ids"])[b["pad_mask"]].tolist())
        # every image fits its batch bucket
        hb, wb = b["images"].shape[1:3]
        assert (b["image_sizes"][:, 0] <= hb).all()
        assert (b["image_sizes"][:, 1] <= wb).all()
    assert shapes == {(64, 128), (128, 64)}  # exactly two buckets
    assert sorted(seen) == list(range(len(ds)))  # full coverage, no dupes


def test_all_landscape_single_bucket():
    ds = FakeDataset([(100, 200), (128, 256), (90, 180), (120, 240)])
    loader = DetectionLoader(ds, batch_size=2, bucket=(64, 128),
                             min_size=64, max_size=128, num_workers=2)
    shapes = {b["images"].shape[1:3] for b in loader}
    assert shapes == {(64, 128)}


def test_sharded_ranks_agree_on_bucket_sequence():
    """Multi-host lockstep: every rank yields the same number of batches
    with the SAME per-step bucket, or jitted collectives desynchronize."""
    ds = FakeDataset(MIXED_SIZES + [(110, 220)])  # odd landscape count
    loaders = [DetectionLoader(ds, 1, (64, 128), 64, 128, shard=(r, 2),
                               num_workers=1) for r in range(2)]
    plans = [[bucket for _, bucket in l._batches()] for l in loaders]
    assert plans[0] == plans[1]
    assert len(set(plans[0])) == 2
    # union of real (non-padded) ids covers the dataset
    ids = set()
    for l in loaders:
        for b in l:
            ids.update(np.asarray(b["image_ids"])[b["pad_mask"]].tolist())
    assert ids == set(range(len(ds)))


def test_mixed_eval_pipeline_correct_map(tmp_path):
    """GT routed through the full loader (resize -> orientation bucket ->
    pad -> rescale-to-original) evaluates to mAP 1.0 against the original
    annotations — the coordinate chain is exact for BOTH buckets."""
    import jax.numpy as jnp

    from snn_automotive_object_detection_tpu.models.transform import (
        rescale_boxes,
    )

    _, ds_yaml, _ = make_mini_env(tmp_path, n_images=6, sizes=MIXED_SIZES)
    import yaml

    cfg = yaml.safe_load(open(ds_yaml))
    ds = CocoDataset(cfg["images_dir"], cfg["ann_file_val"])
    gt = {}
    for i in range(len(ds)):
        _, t = ds[i]
        gt[int(np.asarray(t["image_id"]).item())] = {
            "boxes": t["boxes"].astype(np.float64),
            "labels": t["labels"],
            "areas": t.get("area", ((t["boxes"][:, 2] - t["boxes"][:, 0])
                                    * (t["boxes"][:, 3] - t["boxes"][:, 1]))),
            "iscrowd": np.zeros(len(t["boxes"]), bool),
        }
    ev = COCOEval(gt, category_ids=[1, 2, 3])
    loader = DetectionLoader(ds, batch_size=2, bucket=(64, 128),
                             min_size=64, max_size=128, num_workers=2)
    shapes = set()
    for b in loader:
        shapes.add(b["images"].shape[1:3])
        boxes = rescale_boxes(jnp.asarray(b["targets"]["boxes"]),
                              jnp.asarray(b["image_sizes"]),
                              jnp.asarray(b["original_sizes"]))
        for i in range(len(b["image_ids"])):
            if not b["pad_mask"][i]:
                continue
            v = b["targets"]["valid"][i]
            ev.add_detections(int(b["image_ids"][i]),
                              np.asarray(boxes[i])[v],
                              np.ones(int(v.sum())),
                              b["targets"]["labels"][i][v])
    assert shapes == {(64, 128), (128, 64)}
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats[0] == pytest.approx(1.0, abs=1e-6)


def test_pascal_layout_cli_eval(tmp_path):
    """The --test-only CLI runs end-to-end on a mixed-orientation
    (pascal-layout) dataset — the round-3 loader assert crash is gone."""
    import cli.train as cli_train

    _, ds_yaml, model_yaml = make_mini_env(tmp_path, n_images=4,
                                           sizes=[(128, 256), (200, 100),
                                                  (100, 200), (256, 128)])
    args = cli_train.get_args_parser().parse_args(
        ["-d", ds_yaml, "--model-config", model_yaml, "--rpn-snn",
         "--detector-snn", "-t-rpn", "2", "-t-det", "2", "-b", "2",
         "-j", "2", "--fp32", "--test-only"])
    stats = cli_train.main(args)
    assert stats.shape == (12,)
    assert np.isfinite(stats).all()


def test_no_metadata_portrait_names_protocol_fix():
    """A dataset WITHOUT get_height_and_width that yields a portrait image
    must fail with an error naming the protocol method, not a bare assert
    (VERDICT r4 #8)."""

    class NoMetaDataset:
        """One portrait image, no size-metadata protocol."""

        inner = FakeDataset([(200, 100)])

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return self.inner[i]

    ds = NoMetaDataset()
    assert not hasattr(ds, "get_height_and_width")
    loader = DetectionLoader(ds, batch_size=1, bucket=(64, 128),
                             min_size=64, max_size=128, num_workers=1)
    with pytest.raises(ValueError, match="get_height_and_width"):
        for _ in loader:
            pass
