"""Data pipeline tests over a synthetic on-disk COCO dataset."""

import json
import os

import numpy as np
import pytest

from snn_automotive_object_detection_tpu.data.coco import CocoDataset, CocoIndex
from snn_automotive_object_detection_tpu.data.loader import DetectionLoader
from snn_automotive_object_detection_tpu.data import transforms as T
from snn_automotive_object_detection_tpu.models.transform import resize_shape


@pytest.fixture
def coco_dir(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    sizes = [(256, 512), (300, 400), (128, 256)]
    for i, (h, w) in enumerate(sizes, start=1):
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.png"), img)
        images.append({"id": i, "file_name": f"{i}.png", "height": h, "width": w})
        for _ in range(i):  # i annotations on image i
            x, y = rng.uniform(0, w - 60), rng.uniform(0, h - 40)
            bw, bh = rng.uniform(20, 50), rng.uniform(15, 35)
            annotations.append({
                "id": ann_id, "image_id": i, "bbox": [x, y, bw, bh],
                "category_id": int(rng.integers(1, 4)), "area": bw * bh,
                "iscrowd": 0,
            })
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_coco_dataset_loads(coco_dir):
    img_dir, ann_file = coco_dir
    ds = CocoDataset(img_dir, ann_file)
    assert len(ds) == 3
    img, target = ds[1]
    assert img.shape == (300, 400, 3)
    assert target["boxes"].shape == (2, 4)
    assert (target["boxes"][:, 2] > target["boxes"][:, 0]).all()


def test_known_classes_remap(coco_dir):
    img_dir, ann_file = coco_dir
    known = [
        {"id": 0, "orig_id": 0, "name": "background"},
        {"id": 1, "orig_id": 3, "name": "c3"},
    ]
    ds = CocoDataset(img_dir, ann_file, known_classes=known)
    for i in range(len(ds)):
        _, t = ds[i]
        assert set(np.unique(t["labels"])).issubset({1})
        assert len(t["boxes"]) > 0  # images without known classes are pruned


def test_loader_batches_fixed_shape(coco_dir):
    img_dir, ann_file = coco_dir
    ds = CocoDataset(img_dir, ann_file)
    loader = DetectionLoader(ds, batch_size=2, bucket=(128, 256),
                             min_size=128, max_size=256, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 128, 256, 3)
    assert b["images"].dtype == np.float32
    assert b["targets"]["boxes"].shape[0] == 2
    # valid GT boxes are inside the resized area
    sizes = b["image_sizes"]
    for i in range(2):
        v = b["targets"]["valid"][i]
        boxes = b["targets"]["boxes"][i][v]
        assert (boxes[:, 2] <= sizes[i, 1] + 1e-3).all()
        assert (boxes[:, 3] <= sizes[i, 0] + 1e-3).all()
    # last batch padded, pad_mask marks the real image
    assert batches[1]["pad_mask"].tolist() == [True, False]


def test_loader_sharding(coco_dir):
    # DistributedSampler semantics: every shard yields the SAME number of
    # batches (wrap-around padding), and together they cover the dataset.
    img_dir, ann_file = coco_dir
    ds = CocoDataset(img_dir, ann_file)
    l0 = DetectionLoader(ds, 1, (128, 256), 128, 256, shard=(0, 2))
    l1 = DetectionLoader(ds, 1, (128, 256), 128, 256, shard=(1, 2))
    ids0 = [b["image_ids"][0] for b in l0]
    ids1 = [b["image_ids"][0] for b in l1]
    assert len(ids0) == len(ids1) == len(l0) == len(l1)  # equal step counts
    assert set(ids0) | set(ids1) == {b["image_ids"][0]
                                     for b in DetectionLoader(
                                         ds, 1, (128, 256), 128, 256)}


def test_resize_shape_matches_torchvision_rule():
    assert resize_shape((1024, 2048), 768, 1536) == (768, 1536)
    assert resize_shape((720, 1280), 768, 1536) == (768, 1365)
    assert resize_shape((500, 500), 768, 1536) == (768, 768)


def test_hflip_flips_boxes(rng):
    img = rng.uniform(0, 255, (60, 100, 3)).astype(np.uint8)
    t = {"boxes": np.array([[10.0, 5.0, 30.0, 25.0]], np.float32),
         "labels": np.array([1])}
    flip = T.RandomHorizontalFlip(p=1.0, rng=np.random.default_rng(0))
    img2, t2 = flip(img, t)
    np.testing.assert_allclose(t2["boxes"], [[70.0, 5.0, 90.0, 25.0]])
    np.testing.assert_array_equal(img2[:, ::-1], img)


def test_noise_and_rain_transforms(rng):
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
    noisy, _ = T.RandomNoise("gaussian", 0.01, np.random.default_rng(0))(img, None)
    assert noisy.dtype == np.float32 and noisy.min() >= 0 and noisy.max() <= 1
    assert abs(noisy.std() - (img.astype(np.float32) / 255).std()) > 1e-4

    syp, _ = T.RandomNoise("syp", 0.2, np.random.default_rng(0))(img, None)
    frac_extreme = ((syp == 0) | (syp == 1)).mean()
    assert frac_extreme > 0.05

    rainy, _ = T.Rain("light", rng=np.random.default_rng(0))(img, None)
    assert rainy.shape == (64, 96, 3)
    assert not np.allclose(rainy, img.astype(np.float32) / 255)


def test_train_presets_run(rng):
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
    base_target = {
        "boxes": np.array([[10.0, 10.0, 60.0, 50.0], [70.0, 40.0, 140.0, 100.0]],
                          np.float32),
        "labels": np.array([1, 2]),
    }
    for policy in ("hflip", "lsj", "multiscale", "ssd", "ssdlite", "none"):
        tf = T.train_transform(policy, np.random.default_rng(3))
        out, t = tf(img.copy(), {k: v.copy() for k, v in base_target.items()})
        assert out.ndim == 3 and out.shape[2] == 3
        if t is not None and len(t.get("boxes", ())):
            b = t["boxes"]
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
            assert (b[:, [0, 2]] <= out.shape[1] + 1e-3).all()
            assert (b[:, [1, 3]] <= out.shape[0] + 1e-3).all()
            assert len(t["labels"]) == len(b)


def test_loader_sharding_tiny_dataset(coco_dir):
    # Wrap-around padding must TILE when the pad exceeds the dataset size
    # (torch DistributedSampler's indices * ceil rule): n=2 images across
    # world=8 -> every rank still yields exactly one batch.
    img_dir, ann_file = coco_dir
    ds = CocoDataset(img_dir, ann_file)
    n = len(ds)
    world = 4 * n
    lens = []
    for rank in range(world):
        l = DetectionLoader(ds, 1, (128, 256), 128, 256, shard=(rank, world))
        lens.append(len([b for b in l]))
    assert lens == [1] * world


def test_loader_drop_last_truncates_indices(coco_dir):
    img_dir, ann_file = coco_dir
    ds = CocoDataset(img_dir, ann_file)
    l = DetectionLoader(ds, 2, (128, 256), 128, 256, drop_last=True)
    n_batches = len(l)
    assert n_batches == len(ds) // 2
    # no partially-consumed tail: the index list itself is truncated
    assert len(l._indices()) == n_batches * 2


def test_smoke_module(tmp_path):
    """python -m ...data.smoke (reference datasets.py:177-214 smoke block):
    iterates loader batches and writes a GT panel (PARITY.md claim)."""
    from tests.mini_dataset import make_mini_env
    from snn_automotive_object_detection_tpu.data import smoke

    _, ds_yaml, _ = make_mini_env(tmp_path)
    out = tmp_path / "panel.png"
    args = smoke.get_args_parser().parse_args(
        ["-d", ds_yaml, "--batches", "2", "-b", "2",
         "--bucket", "64", "128", "-j", "2", "--out", str(out)])
    smoke.main(args)
    assert out.exists() and out.stat().st_size > 0
