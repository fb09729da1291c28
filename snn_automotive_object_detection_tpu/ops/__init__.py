"""Pure-JAX detection ops: boxes, NMS, anchors, matching, sampling, RoIAlign.

These replace the native torchvision C++/CUDA kernels used by the reference
(`/root/reference/rpn.py`, `roi_heads.py`) with XLA-friendly, statically-shaped
equivalents (fixed capacities + validity masks instead of dynamic box lists).
"""

from snn_automotive_object_detection_tpu.ops import boxes
from snn_automotive_object_detection_tpu.ops.boxes import (
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    small_box_mask,
)
from snn_automotive_object_detection_tpu.ops.nms import batched_nms_mask, nms_mask
from snn_automotive_object_detection_tpu.ops.anchors import AnchorSpec, generate_anchors
from snn_automotive_object_detection_tpu.ops.matcher import match_boxes
from snn_automotive_object_detection_tpu.ops.sampler import balanced_sample
from snn_automotive_object_detection_tpu.ops.roi_align import (
    multiscale_roi_align,
    roi_align,
)
