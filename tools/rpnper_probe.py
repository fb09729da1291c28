"""TPU A/B for XLA-side encoder periods (RPN_XLA_PERIODS, pallas_rpn.py).

Times the fused RPN head standalone (all 5 FPN levels, production bucket
(768, 1536), batch 2, T=8, AMP dtypes) with the in-kernel period pass vs
the XLA-precomputed period plane. The period formula is pointwise, so the
XLA pass fuses into the producer; the kernel stops recomputing periods
over (th+2)/th redundant halo rows (2x at P2, where VMEM forces th=2) at
the cost of one extra HBM write of the period plane.

Data is generated on device (the tunnel stalls on >1MB uploads); sync via
scalar readback.  Usage:  python tools/rpnper_probe.py
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

    def run(xla_periods):
        def f(fs):
            pr._XLA_PERIODS_DEFAULT = xla_periods
            return pr.rpn_head_snn_pallas_apply(
                params, fs, T, state_dtype=jnp.bfloat16,
                lif_state_dtype=jnp.float32)
        return jax.jit(lambda fs: f(fs)[:2])

    base = run(False)
    t_base = timed(base, feats)
    print(f"in-kernel periods: {t_base:7.3f} ms", flush=True)
    ref = [np.asarray(o) for o in base(feats)[0]]

    xp = run(True)
    t_xp = timed(xp, feats)
    got = [np.asarray(o) for o in xp(feats)[0]]
    exact = all(np.array_equal(r, g) for r, g in zip(ref, got))
    print(f"XLA periods:       {t_xp:7.3f} ms  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
