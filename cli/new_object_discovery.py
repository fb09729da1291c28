"""Open-set new-object discovery from exported proposals/detections.

Equivalent of the reference's new_object_discovery.py, operating on the
.npz dump written by ``cli/train.py -ext-prop-det``:

  1. drop background (label-0) boxes with IoU > --iou-thr against any known
     detection (:87-120)
  2. score each surviving BG box as sum_j IoU(bg, proposal_j) * objectness_j
     (:147-153)
  3. NMS on the new-object scores (:156)
  4. remove BG boxes overlapping the dataset's ego-vehicle region
     (cityscapes: [0.15W, 0.8H, W, H]; bdd: [0, 0.9H, W, H], :125-134)
  5. render known (green) vs "unk" (red) panels, write params.txt

The reference's :79 referenced an undefined args.compute_metrics (a latent
crash) — fixed here: --save-images alone is a valid invocation.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args_parser(add_help=True):
    p = argparse.ArgumentParser(description="New object discovery",
                                add_help=add_help)
    p.add_argument("-d", "--dataset", required=True, choices=["cityscapes", "bdd"])
    p.add_argument("-f", "--file", required=True,
                   help=".npz dump from train.py -ext-prop-det")
    p.add_argument("--only-known-cls", dest="only_known_cls", action="store_true")
    p.add_argument("-s", "--save-images", dest="save_images", type=int, default=0)
    p.add_argument("-iou", "--iou-thr", dest="iou_thr", type=float, default=0.05)
    p.add_argument("-sc", "--score-thr", dest="score_thr", type=float, default=0.25)
    p.add_argument("-nms", "--nms-thr", dest="nms_thr", type=float, default=0.5)
    p.add_argument("-max", "--max-detections", dest="max_detections", type=int,
                   default=0)
    p.add_argument("--data-root", dest="data_root", default="")
    return p


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    ix = np.clip(np.minimum(a[:, None, 2], b[None, :, 2])
                 - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(a[:, None, 3], b[None, :, 3])
                 - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = ix * iy
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = aa[:, None] + ab[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> np.ndarray:
    order = np.argsort(-scores, kind="stable")
    iou = iou_matrix(boxes, boxes)
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
        suppressed[i] = True
    return np.asarray(keep, np.int64)


EGO_BBOX = {
    # dataset: (W, H, [x1, y1, x2, y2])
    "cityscapes": (2048, 1024, [int(0.15 * 2048), int(0.8 * 1024), 2048, 1024]),
    "bdd": (1280, 720, [0, int(0.9 * 720), 1280, 720]),
}


def discover(detections, dataset: str, iou_thr: float, nms_thr: float,
             max_detections: int = 0):
    """Run the 4 filtering stages in-place; returns the processed list."""
    ego = np.asarray(EGO_BBOX[dataset][2], np.float64)[None]

    out = []
    for det in detections:
        labels = np.asarray(det["labels"])
        boxes = np.asarray(det["boxes"], np.float64)
        scores = np.asarray(det["scores"], np.float64)
        is_bg = labels == 0
        known = {"boxes": boxes[~is_bg], "labels": labels[~is_bg],
                 "scores": scores[~is_bg]}
        bg_boxes = boxes[is_bg]

        # 1. drop BG overlapping known detections
        if len(known["boxes"]):
            overlap = iou_matrix(bg_boxes, known["boxes"]).max(axis=1) > iou_thr
        else:
            overlap = np.zeros(len(bg_boxes), bool)
        bg_boxes = bg_boxes[~overlap]

        # 2. new-object score from pre-NMS proposals x objectness
        proposals = np.asarray(det["proposals"], np.float64)
        objness = np.asarray(det["objectness"], np.float64)
        nos = (iou_matrix(bg_boxes, proposals) * objness[None, :]).sum(axis=1)

        # 3. NMS on the new-object scores
        keep = greedy_nms(bg_boxes, nos, nms_thr)
        bg_boxes, nos = bg_boxes[keep], nos[keep]

        # 4. ego-vehicle exclusion
        keep = iou_matrix(bg_boxes, ego).max(axis=1) == 0 if len(bg_boxes) else \
            np.zeros(0, bool)
        bg_boxes, nos = bg_boxes[keep], nos[keep]

        if max_detections:
            bg_boxes = bg_boxes[:max_detections]
            nos = nos[:max_detections]

        out.append({
            "image_id": det.get("image_id", -1),
            "known": known,
            "new_boxes": bg_boxes,
            "new_object_scores": nos,
        })
    return out


def main(args):
    from snn_automotive_object_detection_tpu.data import create_dataset
    from snn_automotive_object_detection_tpu.utils.config import (
        class_names,
        load_dataset_config,
    )
    from snn_automotive_object_detection_tpu.utils.plotting import (
        image_with_boxes,
        draw_boxes,
    )
    import matplotlib.pyplot as plt

    cfg = load_dataset_config(args.dataset, args.data_root or None)
    out_dir = os.path.join(cfg.get("out_dir", f"outputs/{args.dataset}"),
                           f"new_objects_{args.dataset}")
    os.makedirs(out_dir, exist_ok=True)

    raw = np.load(args.file, allow_pickle=True)["results"]
    detections = list(raw)
    processed = discover(detections, args.dataset, args.iou_thr, args.nms_thr,
                         args.max_detections)

    n_new = sum(len(p["new_boxes"]) for p in processed)
    n_conf = sum((p["new_object_scores"] > args.score_thr).sum()
                 for p in processed)
    print(f"{len(processed)} images: {n_new} candidate new objects, "
          f"{n_conf} above score_thr={args.score_thr}")

    with open(os.path.join(out_dir, "params.txt"), "w") as f:
        for k, v in sorted(vars(args).items()):
            f.write(f"{k} = {v}\n")

    if args.save_images:
        names = class_names(cfg)
        known_classes = cfg.get("known_classes") if args.only_known_cls else None
        if known_classes:
            names = {int(c["id"]): c["name"] for c in known_classes}
        ds = create_dataset(args.dataset, "validation",
                            only_known_cls=args.only_known_cls,
                            data_root=args.data_root or None, cfg=cfg)
        id_to_idx = {img_id: i for i, img_id in enumerate(getattr(ds, "ids",
                     range(len(ds))))}
        count = 0
        for p in processed:
            if count >= args.save_images:
                break
            idx = id_to_idx.get(p["image_id"])
            if idx is None:
                continue
            image, _ = ds[idx]
            fig = image_with_boxes(image, p["known"]["boxes"],
                                   p["known"]["labels"], p["known"]["scores"],
                                   names, color="green")
            sel = p["new_object_scores"] > args.score_thr
            draw_boxes(fig.axes[0], p["new_boxes"][sel],
                       labels=np.zeros(int(sel.sum()), int),
                       scores=p["new_object_scores"][sel],
                       color="red", class_names={0: "unk"})
            fig.savefig(os.path.join(out_dir, f"nod_{count:04d}.png"))
            plt.close(fig)
            count += 1
        print(f"wrote {count} NOD panels to {out_dir}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
