"""YAML config loading (per-dataset + model hyperparameters).

Equivalent of the reference's ``load_config_dict``
(/root/reference/custom_utils.py:25-47) with two additions: reference-style
UPPERCASE keys are accepted for drop-in compatibility, and configs/model.yaml
is actually consumed (it was dead config upstream).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")

_KEY_ALIASES = {
    "IMAGES_DIR": "images_dir",
    "ANN_DIR": "ann_dir",
    "ANN_FILE_TRAIN": "ann_file_train",
    "ANN_FILE_VAL": "ann_file_val",
    "OUT_DIR": "out_dir",
    "NUM_CLASSES": "num_classes",
    "CLASSES": "classes",
    "KNOWN_CLASSES": "known_classes",
    "ROOT_DIR_FOR_DWLOAD": "root_dir",
}


def load_dataset_config(name_or_path: str, data_root: Optional[str] = None) -> Dict[str, Any]:
    """Load a dataset config by name (cityscapes/bdd/idd/pascal/coco) or path.

    data_root: optional prefix prepended to all relative data paths.
    """
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, f"{name_or_path}.yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no dataset config named {name_or_path!r} (looked in {CONFIG_DIR})"
        )
    with open(path) as f:
        raw = yaml.safe_load(f)

    cfg = {_KEY_ALIASES.get(k, k): v for k, v in raw.items()}
    cfg.setdefault("dataset", os.path.splitext(os.path.basename(path))[0])

    if data_root:
        for k in ("images_dir", "ann_file_train", "ann_file_val", "root_dir"):
            if cfg.get(k) and not os.path.isabs(cfg[k]):
                cfg[k] = os.path.join(data_root, cfg[k])
    return cfg


def load_model_yaml(path: Optional[str] = None) -> Dict[str, Any]:
    """Load model hyperparameters (configs/model.yaml by default)."""
    path = path or os.path.join(CONFIG_DIR, "model.yaml")
    with open(path) as f:
        return yaml.safe_load(f)


def class_names(cfg: Dict[str, Any]) -> Dict[int, str]:
    """Normalise the classes table to {id: name} (accepts both the mapping
    form used here and the reference's list-of-dicts form)."""
    classes = cfg.get("classes")
    if classes is None:
        return {}
    if isinstance(classes, dict):
        return {int(k): v for k, v in classes.items()}
    return {int(c["id"]): c["name"] for c in classes}
