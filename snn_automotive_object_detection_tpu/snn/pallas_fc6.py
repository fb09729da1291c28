"""Fused Pallas TPU kernel: constant-current encoder + fc6 GEMM for the
spiking box head (inference path).

The XLA scan path (models/heads.py fastrcnn_snn_apply) round-trips the
encoder membrane [R, 12544] through HBM every timestep: at the flagship
operating point (R = 2048, T_det = 12, bf16) that is ~200 MB/step of pure
state traffic — comparable to the fc6 GEMM's own time — because the encoder
is simulated even though its spike train is known in closed form. The
stacked-T XLA alternative (heads._fastrcnn_snn_precomputed) removes the
state traffic but pays ~15 ms building the [T, R, D] spike tensor with
integer mods at XLA level (measured, CLAUDE.md ledger).

This kernel produces the fc6 input currents for ALL T steps in one pass
with ZERO encoder-state HBM traffic and ZERO materialized spike tensor:

  * Encoder spikes come from the same closed-form THRESHOLD-COUNT period +
    countdown trick as the RPN kernel (snn/pallas_rpn.py): p = 1 +
    sum_m [x * (1 - a^m) <= v_th] (T fused f32 compares, exact), then a
    bf16 countdown generates z_t in VMEM.
  * The fc6 GEMM is k-tiled: grid (row tiles, D tiles) with the D axis
    minor, accumulating all T per-step partial products into one revisited
    [T, tr, rep] float32 output block (first k-step initializes, later ones
    add — the same revisited-output pattern as the training kernel's dw9).
    The 25.7 MB fc6 weight is streamed once per row tile.

The result feeds the existing sequential LIF/fc7/readout scan
(heads._fastrcnn_snn_from_cur6), which is cheap ([R, 1024] state). Spike
trains are bit-identical to the closed-form encoder (same integer periods);
vs the bf16 step-simulated default the only differences are borderline
threshold values — the same (documented) difference class as the RPN kernel
(PARITY.md).

Reference semantics: detection head hot loop
/root/reference/faster_rcnn.py:518-619 (SNNFastRCNNPredictor time loop).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_automotive_object_detection_tpu.snn import functional as snnf

_MAX_T = 32


def _choose_tk(d: int) -> int:
    """Largest divisor of d that is a multiple of 128 and <= 256.

    The cap was 1024 (fewer grid steps), but the double-buffered [tk, rep]
    weight tile then put the collect_rates variant 440 KB over the 16 MB
    scoped-VMEM limit at the flagship head (measured compile OOM); 256
    keeps ~3 MB of headroom at the same total weight traffic."""
    best = 0
    for mult in range(1, d // 128 + 1):
        tk = 128 * mult
        if tk > 256:
            break
        if d % tk == 0:
            best = tk
    return best


def fc6_vmem_bytes(num_steps: int, d: int, rep: int,
                   collect_rates: bool = False,
                   state_bytes: int = 2) -> int:
    """Estimated per-grid-step VMEM footprint of encoder_fc6_pallas.

    The dominant term is the revisited [T, 128, rep] f32 output block; the
    rest is double-buffered x/w tiles, the two countdown scratches, and the
    f32 temporaries Mosaic materializes for the threshold-count pass (real:
    a 440 KB overshoot at tk=896 compile-OOMed, see _choose_tk). Used by
    the detector gate to fall back to the XLA scan instead of risking a
    compile-time VMEM OOM (which can wedge the TPU worker) at nonstandard
    t_det — _MAX_T=32 alone is NOT a safe bound (T~24 at rep=1024 already
    approaches the 16 MB scoped limit)."""
    tk = _choose_tk(d)
    if not tk:
        return 1 << 62  # not expressible -> never fits
    tr = 128
    out = num_steps * tr * rep * 4
    tiles = 2 * tk * rep * state_bytes + 2 * tr * tk * state_bytes
    scratch = 2 * tr * tk * state_bytes
    f32_tmp = 3 * tr * tk * 4
    rates = 2 * tr * 128 * 4 if collect_rates else 0
    return out + tiles + scratch + f32_tmp + rates


# Conservative scoped-VMEM budget (real limit ~16 MB; Mosaic's accounting
# includes internals the estimate can't see, so leave headroom).
FC6_VMEM_BUDGET = 12 * 1024 * 1024


def fc6_fits_vmem(num_steps: int, d: int, rep: int,
                  collect_rates: bool = False) -> bool:
    return fc6_vmem_bytes(num_steps, d, rep, collect_rates) <= FC6_VMEM_BUDGET


def _encoder_fc6_kernel(
    thr_ref,   # [T] f32 scalar prefetch — 1 - a^m membrane constants
    x_ref,     # [tr, tk] state dtype — RoI feature tile
    w_ref,     # [tk, rep] state dtype — fc6 weight tile
    out_ref,   # [T, tr, rep] f32 — fc6 currents, revisited over k
    *rest,     # [rate_ref [tr, 128] f32 when collect_rates] + scratches
    num_steps: int,
    collect_rates: bool,
):
    if collect_rates:
        rate_ref, rest = rest[0], rest[1:]
    per_ref, cnt_ref = rest
    sd = per_ref.dtype
    enc_vth = float(snnf.ENCODER_PARAMS.v_th)

    k = pl.program_id(1)

    # Closed-form first-spike period as a threshold count (see module
    # docstring / snn/pallas_rpn.py).
    xf = x_ref[:].astype(jnp.float32)
    p = jnp.ones_like(xf)
    for m in range(num_steps):
        p = p + (xf * thr_ref[m] <= enc_vth).astype(jnp.float32)
    per_ref[:] = p.astype(sd)
    cnt_ref[:] = per_ref[:]

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if collect_rates:
            rate_ref[:] = jnp.zeros_like(rate_ref)

    zcnt = None
    for t in range(num_steps):
        # Countdown-to-spike (compares in f32: v5e Mosaic has no bf16
        # vector compares; the extension is exact).
        c = cnt_ref[:] - 1.0
        spike = c.astype(jnp.float32) < 0.5
        cnt_ref[:] = jnp.where(spike, per_ref[:], c)
        z = spike.astype(sd)
        out_ref[t] = out_ref[t] + jnp.dot(
            z, w_ref[:], preferred_element_type=jnp.float32
        )
        if collect_rates:
            zs = spike.astype(jnp.float32)
            zcnt = zs if zcnt is None else zcnt + zs
    if collect_rates:
        # Per-row spike count over this (k, all t) tile, broadcast across
        # the 128 lanes of the rate block (lane 0 is read outside).
        rows = jnp.sum(zcnt, axis=1, keepdims=True)  # [tr, 1]
        rate_ref[:] = rate_ref[:] + jnp.broadcast_to(rows, rate_ref.shape)


def encoder_fc6_pallas(
    x: jnp.ndarray,
    w6: jnp.ndarray,
    num_steps: int,
    state_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    collect_rates: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused encoder + fc6 for all T steps.

    x: [R, D] flattened RoI features (any float dtype); w6: [D, rep].
    Returns (cur6_all [T, R, rep] float32, enc_counts [R] float32 or None)
    — enc_counts = total encoder spikes per row (for the rate bookkeeping
    of faster_rcnn.py:518-619).
    """
    assert num_steps <= _MAX_T
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, d = x.shape
    rep = w6.shape[1]
    if not interpret and not fc6_fits_vmem(d=d, rep=rep, num_steps=num_steps,
                                           collect_rates=collect_rates):
        # Fail fast with a real error: a compile-time VMEM OOM can wedge
        # the TPU worker for minutes (CLAUDE.md). Callers gate on
        # fc6_fits_vmem and fall back to the XLA scan.
        raise ValueError(
            f"encoder_fc6_pallas VMEM estimate "
            f"{fc6_vmem_bytes(num_steps, d, rep, collect_rates)} B exceeds "
            f"budget {FC6_VMEM_BUDGET} B (T={num_steps}, d={d}, rep={rep})"
        )
    tk = _choose_tk(d)
    assert tk and rep % 128 == 0, (d, rep)

    tr = 128
    r_pad = (r + tr - 1) // tr * tr
    # Zero rows never spike -> zero currents; sliced off below.
    x_p = jnp.pad(x.astype(state_dtype), ((0, r_pad - r), (0, 0)))

    a = 1.0 - snnf.DT * snnf.ENCODER_PARAMS.tau_mem_inv
    thresholds = 1.0 - a ** jnp.arange(1, num_steps + 1, dtype=jnp.float32)

    n_r, n_k = r_pad // tr, d // tk
    kernel = functools.partial(
        _encoder_fc6_kernel, num_steps=num_steps, collect_rates=collect_rates
    )
    out_specs = [
        pl.BlockSpec((num_steps, tr, rep), lambda i, k, *_: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((num_steps, r_pad, rep), jnp.float32)]
    if collect_rates:
        out_specs.append(pl.BlockSpec((tr, 128), lambda i, k, *_: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((r_pad, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=[
            pl.BlockSpec((tr, tk), lambda i, k, *_: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, rep), lambda i, k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tr, tk), state_dtype),
            pltpu.VMEM((tr, tk), state_dtype),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(thresholds, x_p, w6.astype(state_dtype))
    cur6 = outs[0][:, :r]
    counts = outs[1][:r, 0] if collect_rates else None
    return cur6, counts
