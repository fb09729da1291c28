"""Evaluation: COCO-protocol detection metrics (host-side numpy).

pycocotools is not available in this environment; this package implements
the COCOeval bbox protocol from scratch (same matching rules, area ranges,
101-point interpolation and 12 summary stats) so mAP numbers are directly
comparable with the reference's printouts (/root/reference/coco_eval.py).
"""

from snn_automotive_object_detection_tpu.evaluation.coco_metrics import COCOEval
from snn_automotive_object_detection_tpu.evaluation.evaluator import CocoEvaluator
