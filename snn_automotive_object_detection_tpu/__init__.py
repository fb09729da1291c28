"""TPU-native hybrid ANN/SNN Faster R-CNN framework for automotive object detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`aitor-martinez-seras/SNN-Automotive-Object-Detection` (reference mounted at
/root/reference): a frozen ResNet-50-FPN backbone feeding a *spiking* region
proposal network and a *spiking* RoI box head (LIF neuron dynamics unrolled
over discrete time steps), trained and evaluated on Cityscapes / BDD100K / IDD
with COCO-protocol mAP, spike-rate/energy analysis, noise-robustness sweeps and
open-set new-object discovery.

Design stance (TPU-first, not a port):
  * functional models — parameter pytrees + pure ``apply`` functions
  * static shapes everywhere — fixed-capacity boxes/proposals + validity masks
  * ``lax.scan`` for the SNN time axis; fused Pallas kernels for the hot heads
  * SPMD data parallelism over a ``jax.sharding.Mesh`` (psum grads over ICI)
  * host-side input pipeline + COCO-protocol evaluation (no pycocotools dep)
"""

__version__ = "0.1.0"

_TOP_LEVEL = {
    "create_model": "snn_automotive_object_detection_tpu.models.factory",
    "DetectorConfig": "snn_automotive_object_detection_tpu.models.factory",
    "init_params": "snn_automotive_object_detection_tpu.models.factory",
    "detector_apply": "snn_automotive_object_detection_tpu.models.detector",
    "CocoEvaluator": "snn_automotive_object_detection_tpu.evaluation",
    "create_dataset": "snn_automotive_object_detection_tpu.data",
    "DetectionLoader": "snn_automotive_object_detection_tpu.data.loader",
    "load_dataset_config": "snn_automotive_object_detection_tpu.utils.config",
}


def __getattr__(name):
    """Lazy top-level API (avoids importing jax on bare package import)."""
    if name in _TOP_LEVEL:
        import importlib

        return getattr(importlib.import_module(_TOP_LEVEL[name]), name)
    raise AttributeError(name)
