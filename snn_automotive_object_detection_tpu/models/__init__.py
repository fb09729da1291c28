"""Model layer: backbone, RPN, RoI heads, detector assembly, factory.

Functional design: every module is (init_fn -> params pytree, apply_fn pure
function). No module classes, no mutable state — jit/grad/shard_map compose
directly over the param trees.
"""

from snn_automotive_object_detection_tpu.models.resnet_fpn import (
    init_resnet50_fpn,
    resnet50_fpn_apply,
)
from snn_automotive_object_detection_tpu.models.factory import create_model, DetectorConfig
