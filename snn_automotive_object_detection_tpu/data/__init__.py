"""Host-side input pipeline: datasets, transforms, bucketed batch loader.

The model consumes fixed-shape batches; all variable-size work (decode,
resize, augment, pad, GT packing) happens here on the host, overlapped with
TPU compute via a threaded prefetcher.
"""

from snn_automotive_object_detection_tpu.data.coco import CocoDataset, CocoIndex
from snn_automotive_object_detection_tpu.data.idd import IDDDataset
from snn_automotive_object_detection_tpu.data.registry import create_dataset
from snn_automotive_object_detection_tpu.data.loader import DetectionLoader
