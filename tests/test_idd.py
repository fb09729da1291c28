"""IDD (VOC-XML) dataset tests over synthetic files."""

import numpy as np
import pytest

from snn_automotive_object_detection_tpu.data.idd import IDDDataset, IDD_CLASS_TO_ID
from snn_automotive_object_detection_tpu.evaluation.evaluator import (
    ground_truth_from_dataset,
)

XML_TMPL = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
OBJ_TMPL = """<object>
    <name>{cls}</name>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


@pytest.fixture
def idd_root(tmp_path, rng):
    import cv2

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    names = []
    for i in range(3):
        name = f"img{i:03d}"
        names.append(name)
        img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "JPEGImages" / f"{name}.jpg"), img)
        objs = "".join(
            OBJ_TMPL.format(cls=cls, x1=10 + 20 * j, y1=15, x2=40 + 20 * j, y2=60)
            for j, cls in enumerate(["car", "autorickshaw"][: i + 1])
        )
        (tmp_path / "Annotations" / f"{name}.xml").write_text(
            XML_TMPL.format(name=name, w=160, h=120, objects=objs)
        )
    (tmp_path / "val.txt").write_text("\n".join(names) + "\n")
    return str(tmp_path)


def test_idd_dataset(idd_root):
    ds = IDDDataset(idd_root, "val")
    assert len(ds) == 3
    img, t = ds[1]
    assert img.shape == (120, 160, 3)
    assert t["boxes"].shape == (2, 4)
    assert t["labels"].tolist() == [IDD_CLASS_TO_ID["car"],
                                    IDD_CLASS_TO_ID["autorickshaw"]]
    assert (t["area"] > 0).all()


def test_idd_ground_truth_for_eval(idd_root):
    ds = IDDDataset(idd_root, "val")
    gt, cat_ids, img_ids = ground_truth_from_dataset(ds)
    assert img_ids == [0, 1, 2]
    assert IDD_CLASS_TO_ID["car"] in cat_ids
    assert gt[2]["boxes"].shape == (2, 4)
