"""Analysis CLI tests: NOD main, energy plots, noise plots."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_nod_main_end_to_end(tmp_path, rng, monkeypatch):
    """new_object_discovery.main over a synthetic dump + dataset."""
    import cv2

    from cli import new_object_discovery as nod

    # Synthetic cityscapes-like val set (1024x2048 originals).
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, anns = [], []
    for i in range(1, 3):
        img = rng.uniform(0, 255, (256, 512, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.png"), img)
        images.append({"id": i, "file_name": f"{i}.png", "height": 256, "width": 512})
        anns.append({"id": i, "image_id": i, "bbox": [60, 60, 80, 60],
                     "category_id": 1, "area": 4800, "iscrowd": 0})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "car"}],
    }))
    ds_yaml = tmp_path / "cityscapes.yaml"
    ds_yaml.write_text(f"""
dataset: cityscapes
images_dir: {img_dir}
ann_file_train: {ann_file}
ann_file_val: {ann_file}
out_dir: {tmp_path / 'out'}
num_classes: 2
classes: {{0: background, 1: car}}
""")

    # Synthetic per-image detection dumps with known + BG boxes + proposals.
    results = []
    for i in (1, 2):
        results.append({
            "image_id": i,
            "boxes": np.array([[60, 60, 140, 120],      # known (label 1)
                               [300, 40, 380, 100],     # BG candidate
                               [62, 61, 141, 121]],     # BG overlapping known
                              np.float64),
            "labels": np.array([1, 0, 0]),
            "scores": np.array([0.9, 0.8, 0.7]),
            "all_scores": np.zeros((4, 2)),
            "all_boxes": np.zeros((4, 2, 4)),
            "proposals": np.array([[295, 35, 385, 105], [0, 0, 50, 50]],
                                  np.float64),
            "objectness": np.array([0.9, 0.2]),
        })
    dump = tmp_path / "dump.npz"
    np.savez_compressed(dump, results=np.asarray(results, dtype=object),
                        allow_pickle=True)

    # Point the config loader at our yaml via the path-accepting -d.
    args = nod.get_args_parser().parse_args([
        "-d", "cityscapes", "-f", str(dump), "-s", "2", "-sc", "0.1",
    ])
    monkeypatch.setattr(
        "snn_automotive_object_detection_tpu.utils.config.CONFIG_DIR",
        str(tmp_path),
    )
    nod.main(args)

    out_dir = tmp_path / "out" / "new_objects_cityscapes"
    assert (out_dir / "params.txt").exists()
    assert len(list(out_dir.glob("nod_*.png"))) == 2

    # Algorithm checks: overlapping BG dropped, far BG kept with high score.
    processed = nod.discover(results, "cityscapes", 0.05, 0.5)
    for p in processed:
        assert len(p["new_boxes"]) == 1
        assert p["new_boxes"][0][0] == 300
        assert p["new_object_scores"][0] > 0.5  # IoU ~0.79 * obj 0.9


def test_energy_plot_cli(tmp_path):
    from cli import energy_efficiency_plot as ep

    # 2x2 sweep grids.
    eff = [[r, d, 0.1 + 0.05 * (r + d)] for r in (4, 5) for d in (8, 9)]
    perf = [[r, d, 0.2, 0.4 + 0.01 * (r + d), 0.5] for r in (4, 5) for d in (8, 9)]
    eff_p = tmp_path / "eff.json"
    perf_p = tmp_path / "perf.json"
    eff_p.write_text(json.dumps(eff))
    perf_p.write_text(json.dumps(perf))
    out = tmp_path / "tradeoff.pdf"
    args = ep.get_args_parser().parse_args([
        "-p", "--efficiency-json", str(eff_p), "--metrics-json", str(perf_p),
        "-o", str(out),
    ])
    ep.main(args)
    assert out.exists()

    mat, rvals, dvals = ep.tradeoff_matrix(eff, perf)
    assert mat.shape == (2, 2)
    # Lowest consumption + highest mAP combo (r=4,d=8 is lowest eff ->
    # best eff score but lowest perf) — matrix must be finite everywhere.
    assert np.isfinite(mat).all()


def test_energy_recompute_from_npz(tmp_path, capsys):
    from cli import energy_efficiency_plot as ep

    f = tmp_path / "rates.npz"
    np.savez(f, shared=np.full((5, 4), 0.05), fc6=np.full(8, 0.02),
             fc7=np.full(8, 0.01))
    args = ep.get_args_parser().parse_args([
        "-f", str(f), "-t-rpn", "8", "-t-det", "12", "--bucket", "768", "1536",
    ])
    ep.main(args)
    out = capsys.readouterr().out
    assert "Total energy consumption" in out
    assert "FC7" in out


def test_noise_plots_cli(tmp_path):
    from cli import noise_plots as npl

    rows_a = [["gaussian", 0.0, 0.3, 0.5, 0.4], ["gaussian", 0.01, 0.2, 0.4, 0.35]]
    rows_b = [["rain", 0, 0.3, 0.5, 0.4], ["rain", 50, 0.25, 0.45, 0.37]]
    ga = tmp_path / "g.json"
    ra = tmp_path / "r.json"
    ga.write_text(json.dumps(rows_a))
    ra.write_text(json.dumps(rows_b))
    out = tmp_path / "noise.png"
    args = npl.get_args_parser().parse_args([
        "--gaussian", f"SNN={ga}", "--rain", f"SNN={ra}", "-o", str(out),
    ])
    npl.main(args)
    assert out.exists()
