"""CLI-level tests: drive cli/train.py's paths on a tiny synthetic dataset."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli import train as cli_train


from tests.mini_dataset import make_mini_env


@pytest.fixture(scope="module")
def mini_env(tmp_path_factory):
    import pathlib

    tmp, ds_yaml, model_yaml = make_mini_env(tmp_path_factory.mktemp("mini"))
    return pathlib.Path(tmp), ds_yaml, model_yaml


def make_args(mini_env, *extra):
    _, ds_yaml, model_yaml = mini_env
    argv = ["-d", ds_yaml, "--model-config", model_yaml, "--rpn-snn",
            "--detector-snn", "-t-rpn", "2", "-t-det", "2", "-b", "2",
            "-j", "2", "--fp32", *extra]
    return cli_train.get_args_parser().parse_args(argv)


def test_cli_test_only(mini_env, capsys):
    args = make_args(mini_env, "--test-only")
    stats = cli_train.main(args)
    assert stats.shape == (12,)
    out = capsys.readouterr().out
    assert "Time spent generating detections" in out
    tmp = mini_env[0]
    assert (tmp / "out" / "hyperparams.txt").exists()


def test_cli_extract_prop_det_and_nod(mini_env, tmp_path):
    args = make_args(mini_env, "-ext-prop-det", "test", "-n-img", "3")
    cli_train.main(args)
    tmp = mini_env[0]
    dump = tmp / "out" / "test_results_per_img_cityscapes.npz"
    assert dump.exists()
    data = list(np.load(dump, allow_pickle=True)["results"])
    assert len(data) == 3
    assert {"boxes", "labels", "scores", "all_scores", "all_boxes",
            "proposals", "objectness"} <= set(data[0].keys())

    # New-object discovery over the dump.
    from cli.new_object_discovery import discover

    processed = discover(data, "cityscapes", iou_thr=0.05, nms_thr=0.5)
    assert len(processed) == 3
    for p in processed:
        assert p["new_boxes"].shape[1] == 4 if len(p["new_boxes"]) else True
        assert len(p["new_object_scores"]) == len(p["new_boxes"])


def test_cli_spike_rates(mini_env, capsys):
    args = make_args(mini_env, "--extract-spike-rates", "test")
    cli_train.main(args)
    tmp = mini_env[0]
    f = tmp / "out" / "spike_rates_test_cityscapes.npz"
    assert f.exists()
    data = np.load(f)
    assert data["shared"].shape[0] == 5  # levels
    out = capsys.readouterr().out
    assert "Total energy consumption" in out


def test_cli_train_one_epoch(mini_env):
    args = make_args(mini_env, "--epochs", "1", "--lr", "1e-4",
                     "--print-freq", "1")
    cli_train.main(args)
    tmp = mini_env[0]
    assert (tmp / "out" / "checkpoint").exists()
    # Resume from it for one more epoch.
    args2 = make_args(mini_env, "--epochs", "2", "--resume",
                      str(tmp / "out" / "checkpoint"), "--print-freq", "1")
    cli_train.main(args2)


def test_cli_sweep_metrics(mini_env):
    """T-step sweep CLI (metrics mode, one combo)."""
    from cli import test_and_energy_eff as sweep

    _, ds_yaml, model_yaml = mini_env
    args = sweep.get_args_parser().parse_args([
        "-d", ds_yaml, "--model-config", model_yaml, "--rpn-snn",
        "--detector-snn", "--fp32", "-b", "2", "-j", "2",
        "-o", "metrics", "-r1", "2", "-r2", "2", "-d1", "2", "-d2", "2",
    ])
    sweep.main(args)
    tmp = mini_env[0]
    out = tmp / "out" / "sweep_metrics.json"
    assert out.exists()
    rows = json.loads(out.read_text())
    assert len(rows) == 1 and rows[0][:2] == [2, 2] and len(rows[0]) == 5


def test_cli_noise_sweep(mini_env):
    """Noise sweep CLI (two gaussian points)."""
    from cli import noise_calculations as noise

    _, ds_yaml, model_yaml = mini_env
    args = noise.get_args_parser().parse_args([
        "-d", ds_yaml, "--model-config", model_yaml, "--rpn-snn",
        "--detector-snn", "--fp32", "-b", "2", "-j", "2",
        "-t-rpn", "2", "-t-det", "2",
        "--gaussian-max", "0.01", "--gaussian-step", "0.01",
    ])
    noise.main(args)
    tmp = mini_env[0]
    out = tmp / "out" / "noise_acc.json"
    assert out.exists()
    rows = json.loads(out.read_text())
    assert len(rows) == 2
    assert rows[0][0] == "gaussian" and rows[1][1] == 0.01


def test_cli_plot_images(mini_env):
    args = make_args(mini_env, "--save-images")
    cli_train.main(args)
    tmp = mini_env[0]
    imgs = list((tmp / "out" / "pred_images").glob("*.png"))
    assert len(imgs) >= 1


def test_cli_load_torch_checkpoint(mini_env, tmp_path):
    """--load-model with a reference-layout .pth exercises the converter
    through the real CLI surface."""
    torch = pytest.importorskip("torch")
    from tools.torch_mirror import MirrorDetector

    m = MirrorDetector(num_classes=4, t_rpn=2, t_det=2)
    pth = tmp_path / "model_mini_SNN.pth"
    torch.save({"model": m.state_dict(), "epoch": 3}, pth)

    args = make_args(mini_env, "--test-only", "--load-model", str(pth))
    stats = cli_train.main(args)
    assert stats.shape == (12,)


def test_cli_spike_rates_mobilenet(mini_env, capsys):
    """Mobilenet (3 FPN levels) energy report: level count must come from
    the configured backbone, not the hard-coded ResNet 5 (VERDICT r3 #5) —
    previously the rate/FLOP zip silently mispaired layers."""
    args = make_args(mini_env, "--extract-spike-rates", "test",
                     "--backbone", "mobilenet_v3_large_fpn")
    cli_train.main(args)
    tmp = mini_env[0]
    f = tmp / "out" / "spike_rates_test_cityscapes.npz"
    data = np.load(f)
    assert data["shared"].shape[0] == 3  # mobilenet FPN levels
    out = capsys.readouterr().out
    # 3 RPN levels + FC6/FC7, correctly paired and named.
    assert "LVL_0" in out and "LVL_1" in out and "pool" in out
    assert "LVL_3" not in out
    assert out.count("ANN energy") == 5
    assert "Total energy consumption" in out
