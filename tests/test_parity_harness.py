"""tools/parity_vs_reference.py: one-command checkpoint parity harness
(VERDICT r3 #1/#8), exercised against a torch-mirror state_dict."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")


def test_parity_harness_end_to_end(tmp_path, capsys):
    from tests.mini_dataset import make_mini_env
    from tools import torch_mirror as tm
    from tools import parity_vs_reference as pvr

    _, ds_yaml, model_yaml = make_mini_env(tmp_path)

    torch.manual_seed(0)
    mirror = tm.MirrorDetector(num_classes=4, t_rpn=2, t_det=2)
    ckpt = tmp_path / "mirror.pth"
    torch.save({"model": mirror.state_dict()}, str(ckpt))

    args = pvr.get_args_parser().parse_args([
        str(ckpt), "-d", ds_yaml, "--model-config", model_yaml,
        "-t-rpn", "2", "-t-det", "2", "-b", "2", "-j", "2",
        # CPU run: bf16 has no kernels anyway, but exercise both modes.
    ])
    stats, rates = pvr.main(args)
    out = capsys.readouterr().out
    assert "PARITY REPORT" in out and "bf16-vs-fp32 mAP delta" in out
    assert stats["fp32"].shape == (12,) and stats["bf16"].shape == (12,)
    assert len(rates["fp32"]) == 7 and len(rates["bf16"]) == 7
    assert all(np.isfinite(stats["fp32"]))
