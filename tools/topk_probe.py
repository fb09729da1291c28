"""TPU A/B for the blocked pre-NMS top_k (models/rpn.py `_blocked_top_k`).

Times the standalone 5-level select_pre_nms at the production shapes
(batch 2, (768, 1536) bucket) for plain lax.top_k vs the blocked two-stage
variant at several block sizes. Data is generated on device (the tunnel
stalls on >1MB uploads); sync via scalar readback.

Usage:  python tools/topk_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_automotive_object_detection_tpu.models import rpn

COUNTS = [221184, 55296, 13824, 3456, 864]  # (768,1536) anchor grid x3
TOP_N = 1000
ITERS = 30


def timed(fn, o):
    out = fn(o)
    _ = np.asarray(out[0][:, :1])  # sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(o)
    _ = np.asarray(out[0][:, :1])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (2, sum(COUNTS)), jnp.float32) * 4.0

    plain = jax.jit(lambda x: rpn.select_pre_nms(x, COUNTS, TOP_N, blocked=False))
    t_plain = timed(plain, o)
    print(f"plain   5-level select: {t_plain:7.3f} ms", flush=True)

    ref = [np.asarray(a) for a in plain(o)]
    for block in (8192, 16384, 32768, 55296):
        rpn._BLOCKED_TOPK_MIN = block
        blk = jax.jit(
            lambda x: rpn.select_pre_nms(x, COUNTS, TOP_N, blocked=True))
        t_blk = timed(blk, o)
        got = [np.asarray(a) for a in blk(o)]
        exact = all(np.array_equal(r, g) for r, g in zip(ref, got))
        print(f"blocked block={block:6d}: {t_blk:7.3f} ms  exact={exact}",
              flush=True)

    # Sort-free threshold select on the big levels (VERDICT r4 #4a).
    rpn._BLOCKED_TOPK_MIN = 16384
    rpn._TOPK_MODE = "threshold"
    thr = jax.jit(lambda x: rpn.select_pre_nms(x, COUNTS, TOP_N, blocked=True))
    t_thr = timed(thr, o)
    got = [np.asarray(a) for a in thr(o)]
    # Tie order vs blocked differs only where plain TPU top_k already
    # differs; compare against the blocked (lowest-index-first) reference.
    rpn._TOPK_MODE = "blocked"
    ref_b = [np.asarray(a)
             for a in jax.jit(lambda x: rpn.select_pre_nms(
                 x, COUNTS, TOP_N, blocked=True))(o)]
    exact = all(np.array_equal(r, g) for r, g in zip(ref_b, got))
    print(f"threshold select:      {t_thr:7.3f} ms  exact(vs blocked)={exact}",
          flush=True)


if __name__ == "__main__":
    main()
