"""Utilities: config loading, metric logging, checkpointing, plotting, energy."""

from snn_automotive_object_detection_tpu.utils.config import (
    load_dataset_config,
    load_model_yaml,
)
