"""Deterministic mini COCO-format dataset + config YAMLs for CLI tests.

Shared between the single-process CLI tests (tests/test_cli.py) and the real
2-process distributed eval test (tests/test_distributed.py +
tests/distributed_worker.py), which must drive cli/train.py on IDENTICAL
data from separate processes.
"""

import json
import os

import numpy as np


def make_mini_env(tmp, seed: int = 0, n_images: int = 4, sizes=None):
    """Build a tiny dataset under ``tmp``; returns (tmp, ds_yaml, model_yaml).

    Deterministic in (seed, n_images) so independent processes can recreate
    byte-identical inputs. ``sizes``: optional per-image (h, w) list — pass
    portrait shapes to build a pascal-layout (mixed-orientation) set.
    """
    import cv2

    tmp = os.fspath(tmp)
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(tmp, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        h, w = sizes[i - 1] if sizes else (128, 256)
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i}.png"), img)
        images.append({"id": i, "file_name": f"{i}.png",
                       "height": h, "width": w})
        for _ in range(2):
            x, y = rng.uniform(0, w - 80), rng.uniform(0, h - 60)
            bw, bh = rng.uniform(30, 60), rng.uniform(20, 50)
            annotations.append({"id": aid, "image_id": i,
                                "bbox": [x, y, bw, bh],
                                "category_id": int(rng.integers(1, 4)),
                                "area": bw * bh, "iscrowd": 0})
            aid += 1
    ann_file = os.path.join(tmp, "ann.json")
    with open(ann_file, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)],
        }, f)

    ds_yaml = os.path.join(tmp, "mini.yaml")
    with open(ds_yaml, "w") as f:
        f.write(f"""
dataset: cityscapes
images_dir: {img_dir}
ann_file_train: {ann_file}
ann_file_val: {ann_file}
out_dir: {os.path.join(tmp, 'out')}
num_classes: 4
classes: {{0: background, 1: c1, 2: c2, 3: c3}}
known_classes:
  - {{id: 0, orig_id: 0, name: background}}
  - {{id: 1, orig_id: 3, name: c3}}
""")
    model_yaml = os.path.join(tmp, "model.yaml")
    with open(model_yaml, "w") as f:
        f.write("""
transform: {min_size: 64, max_size: 128}
RPN:
  rpn_pre_nms_top_n_train: 64
  rpn_pre_nms_top_n_test: 64
  rpn_post_nms_top_n_train: 32
  rpn_post_nms_top_n_test: 32
ROIHeads:
  box_batch_size_per_image: 16
  box_detections_per_img: 8
""")
    return tmp, ds_yaml, model_yaml
