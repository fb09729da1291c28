"""TPU A/B for the cross-image-paired RPN kernel (RPN_X2, VERDICT r4 #4b).

Times the fused RPN head standalone (all 5 FPN levels, production bucket
(768, 1536), batch 2, T=8, AMP dtypes) for the per-image kernel vs the
paired variant that interleaves two images' independent step chains inside
one kernel instance. Hypothesis under test: Mosaic can overlap image A's
serial VPU LIF chain with image B's MXU tap matmuls (the round-3 two-
SPATIAL-tile interleave measured within noise; per-step VPU ops are long-
vector throughput-bound, so the expectation here is "no change" — this
probe exists to measure that cross-image rather than assert it).

Data is generated on device (the tunnel stalls on >1MB uploads); sync via
scalar readback.  Usage:  python tools/ximg_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.snn import pallas_rpn as pr

SHAPES = [(192, 384), (96, 192), (48, 96), (24, 48), (12, 24)]
BATCH = 2
T = 8
ITERS = 20


def timed(fn, feats):
    outs = fn(feats)
    _ = np.asarray(outs[0][0][:, :1, 0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        outs = fn(feats)
    _ = np.asarray(outs[0][0][:, :1, 0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(0), 256, 3)
    keys = jax.random.split(jax.random.PRNGKey(1), len(SHAPES))
    feats = [
        jax.random.uniform(k, (BATCH, h, w, 256), jnp.float32, 0.0, 2.0)
        for k, (h, w) in zip(keys, SHAPES)
    ]

    def run(x2):
        def f(fs):
            pr._X2_DEFAULT = x2
            return pr.rpn_head_snn_pallas_apply(
                params, fs, T, state_dtype=jnp.bfloat16,
                lif_state_dtype=jnp.float32)
        return jax.jit(lambda fs: f(fs)[:2])

    for (h, w) in SHAPES:
        feas = pr._x2_feasible((BATCH, h, w, 256), jnp.bfloat16, jnp.float32)
        print(f"level ({h:3d},{w:3d}): x2 "
              f"{'feasible' if feas else 'INFEASIBLE (falls back)'}",
              flush=True)

    base = run(False)
    t_base = timed(base, feats)
    print(f"per-image kernel: {t_base:7.3f} ms", flush=True)
    ref = [np.asarray(o) for o in base(feats)[0]]

    paired = run(True)
    t_x2 = timed(paired, feats)
    got = [np.asarray(o) for o in paired(feats)[0]]
    exact = all(np.array_equal(r, g) for r, g in zip(ref, got))
    print(f"paired x2 kernel: {t_x2:7.3f} ms  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
