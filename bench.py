"""Benchmark: SNN Faster R-CNN inference throughput on one TPU chip.

Measures images/sec of the flagship configuration — the released operating
point of the reference (Cityscapes, T_rpn=8, T_det=12, batch 2, input
768x1536; BASELINE.md) — end-to-end: normalize -> ResNet-50-FPN -> spiking
RPN -> proposal filtering/NMS -> RoIAlign -> spiking box head -> open-set
postprocess, all inside one jitted function.

vs_baseline compares against the reference-equivalent PyTorch CPU pipeline
measured on this machine (tools/bench_baseline.py writes
BENCH_BASELINE.json). The reference's own figure of merit is wall-clock
"Time spent generating detections" (reference train.py:284-303).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    # snn (default) | ann | mobilenet_snn — the bench metric always reports
    # the flagship snn config; the others are for ad-hoc measurement.
    model = os.environ.get("BENCH_MODEL", "snn")

    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig,
        init_params,
    )
    from snn_automotive_object_detection_tpu.models.detector import detector_apply

    snn = model != "ann"
    config = DetectorConfig(
        num_classes=9, rpn_snn=snn, detector_snn=snn, t_rpn=8, t_det=12,
        backbone="mobilenet_v3_large_fpn" if model == "mobilenet_snn"
        else "resnet50_fpn",
    )
    # Ad-hoc A/B knobs: BENCH_DISABLE=fpn_pallas,rpn_pallas,... flips any
    # boolean config field off; BENCH_STATE32=0 drops the (default) AMP-style
    # f32 neuron-state mode back to pure-bf16 states, =1 forces it on.
    import dataclasses

    for name in filter(None, os.environ.get("BENCH_DISABLE", "").split(",")):
        config = dataclasses.replace(config, **{name.strip(): False})
    s32 = os.environ.get("BENCH_STATE32")
    if s32 is not None:
        # Strict spelling: stale scripts using truthy values ("true", "yes")
        # must not silently flip numerics (ADVICE r4).
        if s32 not in ("0", "1"):
            raise SystemExit(f"BENCH_STATE32 must be '0' or '1', got {s32!r}")
        config = dataclasses.replace(
            config, snn_state_dtype=jnp.float32 if s32 == "1" else None)

    params = init_params(config, jax.random.PRNGKey(0))
    # Realistic score distributions: BENCH_WEIGHTS=<orbax dir> loads trained
    # weights (e.g. from tools/make_bench_weights.py) so the NMS/postprocess
    # workload matches a trained checkpoint instead of random init.
    weights = os.environ.get("BENCH_WEIGHTS")
    if weights:
        from snn_automotive_object_detection_tpu.utils.checkpoint import (
            load_checkpoint,
            load_weights_lenient,
        )

        params = load_weights_lenient(
            params, load_checkpoint(os.path.abspath(weights))["params"]
        )
    h, w = config.bucket

    # The production loader emits the planar s2d layout for the fused
    # Pallas stem host-side (data/loader.py planar=True); here the random
    # inputs are planarized on device once, outside the timed loop.
    from snn_automotive_object_detection_tpu.models.detector import (
        wants_planar_input,
    )

    planar = wants_planar_input(config)
    img_key = "images_p" if planar else "images"

    @jax.jit
    def run(params, images):
        b = {
            img_key: images,
            "image_sizes": jnp.asarray([[h, w]] * batch, jnp.int32),
            "original_sizes": jnp.asarray([[1024, 2048]] * batch, jnp.int32),
        }
        det, _ = detector_apply(params, b, config, training=False)
        return det["boxes"], det["scores"], det["labels"], det["valid"]

    key = jax.random.PRNGKey(1)
    images = [
        jax.random.uniform(jax.random.fold_in(key, i), (batch, h, w, 3), jnp.float32)
        for i in range(4)
    ]
    if planar:
        from snn_automotive_object_detection_tpu.ops.pallas_stem import (
            planarize_image,
        )

        plan = jax.jit(lambda x: planarize_image(x, config.image_mean))
        images = [plan(x) for x in images]

    import numpy as np

    for i in range(warmup):
        # Force a device->host readback: on the tunneled TPU platform,
        # block_until_ready alone does not wait for remote completion.
        np.asarray(run(params, images[i % len(images)])[1])

    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, images[i % len(images)])
    np.asarray(out[1])  # executions serialize on-device; syncing the last
    dt = time.perf_counter() - t0  # waits for all of them

    imgs_per_sec = batch * iters / dt

    vs_baseline = 0.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("cpu_reference_images_per_sec")
        if ref:
            vs_baseline = imgs_per_sec / ref

    print(json.dumps({
        "metric": "snn_faster_rcnn_inference_throughput_trpn8_tdet12_768x1536",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
