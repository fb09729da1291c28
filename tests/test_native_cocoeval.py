"""Native C++ COCO matcher vs the pure-numpy path on random cases."""

import numpy as np
import pytest

from snn_automotive_object_detection_tpu.evaluation import coco_metrics as cm
from snn_automotive_object_detection_tpu.evaluation._native import (
    coco_match_native,
    get_lib,
)


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_matches_numpy(rng, monkeypatch):
    from snn_automotive_object_detection_tpu.evaluation import _native

    def random_gt(n):
        b = np.stack([rng.uniform(0, 200, n), rng.uniform(0, 200, n),
                      rng.uniform(10, 80, n), rng.uniform(10, 80, n)], 1)
        b[:, 2:] += b[:, :2]
        return b

    for trial in range(8):
        ng = int(rng.integers(0, 8))
        nd = int(rng.integers(1, 25))
        gt = {
            1: {
                "boxes": random_gt(ng),
                "labels": np.ones(ng, np.int64),
                "areas": rng.uniform(100, 10000, ng),
                "iscrowd": rng.integers(0, 2, ng),
            }
        }
        dt_boxes = random_gt(nd)
        # Half the detections overlap a GT strongly.
        for i in range(min(nd, ng)):
            dt_boxes[i] = gt[1]["boxes"][i] + rng.normal(0, 3, 4)
        scores = rng.uniform(0, 1, nd)

        def run(use_native):
            monkeypatch.setattr(_native, "_TRIED", not use_native)
            monkeypatch.setattr(_native, "_LIB", _native._LIB if use_native else None)
            ev = cm.COCOEval(gt, [1])
            ev.add_detections(1, dt_boxes, scores, np.ones(nd, np.int64))
            ev.accumulate()
            return ev.summarize(verbose=False)

        get_lib()  # ensure built
        s_native = run(True)
        s_numpy = run(False)
        np.testing.assert_allclose(s_native, s_numpy, atol=1e-12)
