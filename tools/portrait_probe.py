"""Portrait-bucket TPU probe (VERDICT r4 #3): exercise the transposed
(1536, 768) bucket ONCE on the real TPU with all five Pallas kernels on —
VMEM/tile sanity + an img/s number. Run: python tools/portrait_probe.py

Measured round 5 (v5e, batch 2, trained r5 weights, 15 iters): 45.5 img/s;
first-step compile 514 s (uncached), no VMEM failures at (1536, 768).
"""
import sys, time
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp

from snn_automotive_object_detection_tpu.models.factory import (
    DetectorConfig, init_params,
)
from snn_automotive_object_detection_tpu.models.detector import wants_planar_input
from snn_automotive_object_detection_tpu.train.steps import make_eval_step
from tools.synth_shapes import synth_batch_device

config = DetectorConfig(num_classes=9, t_rpn=8, t_det=12)
params = init_params(config, jax.random.PRNGKey(0))
try:
    from snn_automotive_object_detection_tpu.utils.checkpoint import load_checkpoint
    params = load_checkpoint("/root/.cache/bench_weights5_r5")["params"]
    print("loaded r5 weights")
except Exception as e:
    print("random init (no r5 weights):", e)

hb, wb = config.bucket          # (768, 1536) landscape
h, w = wb, hb                   # transposed portrait bucket
planar = wants_planar_input(config)
eval_step = make_eval_step(config)

@jax.jit
def gen(k):
    b = synth_batch_device(k, 2, h, w)
    if planar:
        from snn_automotive_object_detection_tpu.ops.pallas_stem import planarize_image
        b["images_p"] = planarize_image(b["images"], config.image_mean)
        del b["images"]
    return b

key = jax.random.PRNGKey(123)
t0 = time.time()
b = gen(jax.random.fold_in(key, 0))
det = eval_step(params, {k_: v for k_, v in b.items() if k_ != "targets"})
nv = np.asarray(det["valid"]).sum()
print(f"portrait ({h}x{w}) first step (compile) {time.time()-t0:.1f}s, valid dets {nv}", flush=True)

iters = 15
t0 = time.time()
for i in range(iters):
    bi = gen(jax.random.fold_in(key, i + 1))
    det = eval_step(params, {k_: v for k_, v in bi.items() if k_ != "targets"})
_ = np.asarray(det["scores"][..., :1])  # sync readback
dt = time.time() - t0
print(f"portrait bucket: {2 * iters / dt:.1f} img/s (batch 2, {iters} iters)", flush=True)
print("PORTRAIT OK", flush=True)
