"""COCO-protocol metric tests with analytically-known AP values."""

import numpy as np

from snn_automotive_object_detection_tpu.evaluation.coco_metrics import COCOEval


def gt_entry(boxes, labels, iscrowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return {
        "boxes": boxes,
        "labels": np.asarray(labels),
        "areas": areas,
        "iscrowd": np.asarray(iscrowd if iscrowd is not None else [0] * len(labels)),
    }


def test_perfect_detections_give_map_1():
    gt = {
        1: gt_entry([[10, 10, 60, 60], [100, 100, 180, 160]], [1, 2]),
        2: gt_entry([[0, 0, 50, 50]], [1]),
    }
    ev = COCOEval(gt, [1, 2])
    ev.add_detections(1, np.array([[10, 10, 60, 60], [100, 100, 180, 160]]),
                      np.array([0.9, 0.8]), np.array([1, 2]))
    ev.add_detections(2, np.array([[0, 0, 50, 50]]), np.array([0.95]), np.array([1]))
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[0], 1.0)   # mAP
    assert np.isclose(stats[1], 1.0)   # mAP@.5
    assert np.isclose(stats[8], 1.0)   # mAR@100


def test_half_recall_ap():
    # 2 GTs of one class, only one detected -> AP = 51/101 (101-pt interp).
    gt = {1: gt_entry([[10, 10, 60, 60], [200, 200, 260, 260]], [1, 1])}
    ev = COCOEval(gt, [1])
    ev.add_detections(1, np.array([[10, 10, 60, 60]]), np.array([0.9]), np.array([1]))
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[1], 51 / 101, atol=1e-6)
    assert np.isclose(stats[8], 0.5)


def test_false_positive_after_tp():
    # TP at score .9, FP at score .8: precision at recall 1.0 stays 1.0
    # (envelope), so AP@.5 = 1.0; but a FP at HIGHER score halves it.
    gt = {1: gt_entry([[10, 10, 60, 60]], [1])}
    ev = COCOEval(gt, [1])
    ev.add_detections(1, np.array([[10, 10, 60, 60], [300, 300, 350, 350]]),
                      np.array([0.9, 0.8]), np.array([1, 1]))
    ev.accumulate()
    s1 = ev.summarize(verbose=False)
    assert np.isclose(s1[1], 1.0)

    ev2 = COCOEval(gt, [1])
    ev2.add_detections(1, np.array([[300, 300, 350, 350], [10, 10, 60, 60]]),
                       np.array([0.95, 0.9]), np.array([1, 1]))
    ev2.accumulate()
    s2 = ev2.summarize(verbose=False)
    assert np.isclose(s2[1], 0.5, atol=1e-2)


def test_localization_quality_affects_high_iou_thresholds():
    # Detection at IoU ~0.6 counts at IoU<=0.6 thresholds only.
    gt = {1: gt_entry([[0, 0, 100, 100]], [1])}
    ev = COCOEval(gt, [1])
    # box [0,0,100,75]: inter 7500, union 10000 -> IoU .75 (vs thr .75: tie)
    ev.add_detections(1, np.array([[0, 0, 100, 80]]), np.array([0.9]), np.array([1]))
    # IoU = 8000/10000 = 0.8 -> matches thresholds .5-.8 (7 of 10)
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[1], 1.0)
    assert np.isclose(stats[0], 0.7, atol=1e-6)


def test_crowd_gt_absorbs_unmatched_dets():
    gt = {1: gt_entry([[0, 0, 100, 100], [200, 0, 400, 100]], [1, 1],
                      iscrowd=[0, 1])}
    ev = COCOEval(gt, [1])
    # One TP + two dets inside the crowd region: crowd matches are ignored,
    # not FPs -> AP stays 1 (only 1 countable GT).
    ev.add_detections(
        1,
        np.array([[0, 0, 100, 100], [210, 5, 300, 95], [300, 5, 390, 95]]),
        np.array([0.9, 0.85, 0.8]),
        np.array([1, 1, 1]),
    )
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[1], 1.0)


def test_area_ranges():
    # One small (20x20=400 < 32^2) and one large GT (200x200).
    gt = {1: gt_entry([[0, 0, 20, 20], [100, 100, 300, 300]], [1, 1])}
    ev = COCOEval(gt, [1])
    ev.add_detections(1, np.array([[0, 0, 20, 20], [100, 100, 300, 300]]),
                      np.array([0.9, 0.8]), np.array([1, 1]))
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[3], 1.0)   # AP small
    assert np.isclose(stats[5], 1.0)   # AP large
    assert stats[4] == -1.0            # no medium GT


def test_max_dets_limits_recall():
    # 3 GTs, 3 TPs, but AR@1 only counts the best detection.
    gt = {1: gt_entry([[0, 0, 50, 50], [100, 0, 150, 50], [200, 0, 250, 50]],
                      [1, 1, 1])}
    ev = COCOEval(gt, [1])
    ev.add_detections(
        1,
        np.array([[0, 0, 50, 50], [100, 0, 150, 50], [200, 0, 250, 50]]),
        np.array([0.9, 0.8, 0.7]),
        np.array([1, 1, 1]),
    )
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert np.isclose(stats[6], 1 / 3, atol=1e-6)  # AR@1
    assert np.isclose(stats[8], 1.0)               # AR@100


def test_merge_from():
    gt = {1: gt_entry([[0, 0, 50, 50]], [1]), 2: gt_entry([[0, 0, 50, 50]], [1])}
    a = COCOEval(gt, [1])
    b = COCOEval(gt, [1])
    a.add_detections(1, np.array([[0, 0, 50, 50]]), np.array([0.9]), np.array([1]))
    b.add_detections(2, np.array([[0, 0, 50, 50]]), np.array([0.9]), np.array([1]))
    a.merge_from([b])
    a.accumulate()
    stats = a.summarize(verbose=False)
    assert np.isclose(stats[0], 1.0)


def test_merge_from_dedups_wraparound_duplicates():
    """Sharded loaders pad with wrap-around duplicates, so the SAME image
    (identical detections) can arrive from two processes; the merge must
    keep one copy (reference np.unique merge, coco_eval.py:163-177)."""
    gt = {1: gt_entry([[0, 0, 50, 50]], [1])}
    a = COCOEval(gt, [1])
    b = COCOEval(gt, [1])
    det = (np.array([[0, 0, 50, 50]]), np.array([0.9]), np.array([1]))
    a.add_detections(1, *det)
    b.add_detections(1, *det)  # duplicate eval of image 1 on another rank
    a.merge_from([b])
    assert len(np.concatenate(a.dets[1]["scores"])) == 1
    a.accumulate()
    stats = a.summarize(verbose=False)
    assert np.isclose(stats[0], 1.0)  # a doubled det would be an FP


def test_remove_bg_flag_changes_detection_set():
    """--rm-bg must actually change the evaluated detection set: without it
    label-0 (open-set BG) boxes stay in the evaluator's store like the
    reference (train.py:317-326 only filters under the flag); metrics are
    unaffected either way (label 0 is never a GT category)."""
    from snn_automotive_object_detection_tpu.evaluation.evaluator import (
        CocoEvaluator,
    )

    class _Idx:
        img_to_anns = {1: [{"bbox": [10.0, 10.0, 50.0, 50.0],
                            "category_id": 1, "area": 2500.0, "iscrowd": 0}]}
        cats = {1: {"id": 1}}

    class _Ds:
        index = _Idx()
        ids = [1]

    res = {1: {
        "boxes": np.array([[10, 10, 60, 60], [100, 100, 150, 150]], np.float64),
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([1, 0]),
    }}

    ev_keep = CocoEvaluator(_Ds())
    ev_keep.update(res)
    ev_rm = CocoEvaluator(_Ds(), remove_bg=True)
    ev_rm.update(res)

    kept_labels = np.concatenate(ev_keep.eval.dets[1]["labels"])
    rm_labels = np.concatenate(ev_rm.eval.dets[1]["labels"])
    assert set(kept_labels) == {0, 1}
    assert set(rm_labels) == {1}

    for ev in (ev_keep, ev_rm):
        ev.accumulate()
    s_keep = ev_keep.summarize(verbose=False)
    s_rm = ev_rm.summarize(verbose=False)
    np.testing.assert_array_equal(s_keep, s_rm)
    assert np.isclose(s_keep[0], 1.0)
