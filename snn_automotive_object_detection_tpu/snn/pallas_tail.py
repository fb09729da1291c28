"""Fused Pallas TPU kernel: LIF/fc7/readout tail of the spiking box head.

The XLA scan tail (models/heads.py ``_fastrcnn_snn_from_cur6``) round-trips
the two [R, rep] LIF states (v and i, f32 under the production AMP
numerics) through HBM every timestep: at the flagship operating point
(R = 2000, rep = 1024, T_det = 12) that is ~64 MB/step of state traffic for
~0.3 GFLOP/step of fc7+readout matmuls — measured 1.51 ms standalone, ~5x
its HBM roofline once the states stay resident.

This kernel keeps ALL tail state in VMEM across the T grid steps:

  * grid (row tiles, T) with T minor; the LIF6/LIF7 membranes+currents and
    the two LI readout states live in VMEM scratch, initialized at t == 0
    and written out at t == T-1 (the same revisited-state pattern as the
    RPN kernel's step loop, snn/pallas_rpn.py).
  * per grid step it streams one [tr, rep] bf16 slice of the precomputed
    fc6 currents (snn/pallas_fc6.py output, cast to bf16 exactly like the
    XLA tail's ``cur6_all.astype(cd)``) — total HBM traffic drops from
    ~820 MB to ~48 MB + one pass over the weights.
  * numerics follow snn/functional.py's exact operation order in f32 with
    matmul results rounded once to bf16 (matching ``_linear``'s bf16
    preferred_element_type); compares run in f32 (v5e Mosaic has no bf16
    vector compares, CLAUDE.md). In interpret mode this is BIT-identical
    to the XLA tail scan (tests/test_pallas_tail.py). On hardware,
    Mosaic and XLA may fuse the f32 state chain into fma trees
    differently, so a borderline LIF membrane can sit +-1 ulp either side
    of threshold and flip a spike (measured: max |cls logit| delta 0.016
    at the flagship tail) — the same documented difference class as the
    RPN/fc6 kernels' borderline encoder spikes (PARITY.md).

The readout lane dims (num_classes / 4*num_classes) are zero-padded to the
128-lane width; padded lanes see zero currents and stay zero.

Reference semantics: detection head hot loop
/root/reference/faster_rcnn.py:518-619 (fc7 LIFCell + LICell readouts).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_automotive_object_detection_tpu.snn import functional as snnf

_LANE = 128
_TR = 128


def tail_supported(rep: int, n_cls: int, n_reg: int, num_steps: int) -> bool:
    """Shape gate for the fused tail kernel (the VMEM footprint is
    T-independent — states don't scale with T — so only the tile shapes
    matter: rep must be lane-aligned and the readout widths must fit one
    padded lane block)."""
    return (
        rep % _LANE == 0
        and 0 < n_cls <= _LANE
        and 0 < n_reg <= _LANE
        and num_steps >= 1
    )


def _choose_tc(num_steps: int) -> int:
    """Timesteps per grid invocation: the largest divisor of T <= 4.

    The one-step-per-grid-step variant measured 1.77 ms at the flagship
    tail (R=2048, rep=1024, T=12) — barely under the 1.95 ms XLA scan —
    because 192 tiny grid steps pay ~7 us each of Mosaic step overhead.
    Chunking 4 steps per invocation cuts the grid to 48 steps while the
    [tc, tr, rep] bf16 current block stays ~1 MB."""
    for tc in (4, 3, 2):
        if num_steps % tc == 0:
            return tc
    return 1


def _tail_kernel(
    cur_ref,    # [tc, tr, rep] bf16 — fc6 currents for this time chunk
    w7_ref,     # [rep, rep] bf16
    wc_ref,     # [rep, 128] bf16 (lane-padded cls readout)
    wb_ref,     # [rep, 128] bf16 (lane-padded bbox readout)
    outc_ref,   # [tr, 128] f32 — final LI cls membrane (revisited)
    outb_ref,   # [tr, 128] f32 — final LI bbox membrane (revisited)
    *rest,      # [ratec6, ratec7 [tr, 128] f32 when collect_rates] + scratch
    num_steps: int,
    collect_rates: bool,
    interpret: bool,
):
    if collect_rates:
        rc6_ref, rc7_ref, rest = rest[0], rest[1], rest[2:]
    v6, i6, v7, i7, lic_v, lic_i, lib_v, lib_i = rest[:8]
    if collect_rates:
        c6_ref, c7_ref = rest[8:]

    tc = cur_ref.shape[0]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for ref in (v6, i6, v7, i7, lic_v, lic_i, lib_v, lib_i):
            ref[:] = jnp.zeros_like(ref)
        if collect_rates:
            c6_ref[:] = jnp.zeros_like(c6_ref)
            c7_ref[:] = jnp.zeros_like(c7_ref)

    # Constants exactly as snn/functional.py computes them (Python-float
    # products, rounded once to f32 by the jnp ops below).
    a_mem = snnf.DT * snnf.LIF_PARAMS.tau_mem_inv
    a_syn = snnf.DT * snnf.LIF_PARAMS.tau_syn_inv
    v_th = snnf.LIF_PARAMS.v_th

    def lif(v_ref, i_ref, cur):
        # lif_feed_forward_step: decay v with OLD i -> decay i -> spike on
        # decayed v -> reset -> THEN add the input current.
        v = v_ref[:]
        i = i_ref[:]
        vd = v + a_mem * ((0.0 - v) + i)
        idec = i + (-a_syn) * i
        z = ((vd - v_th) > 0).astype(jnp.float32)
        v_ref[:] = (1.0 - z) * vd
        i_ref[:] = idec + cur
        return z

    def li(v_ref, i_ref, cur):
        # li_feed_forward_step: input jumps the current BEFORE the membrane
        # update (norse LI ordering).
        ij = i_ref[:] + cur
        v_ref[:] = v_ref[:] + a_mem * ((0.0 - v_ref[:]) + ij)
        i_ref[:] = ij + (-a_syn) * ij

    def mm(z, w_ref):
        # _linear's numerics: f32 MXU accumulation rounded ONCE to bf16.
        # Mosaic requires a 32-bit matmul accumulator (bf16
        # preferred_element_type is rejected), so the compiled kernel
        # requests f32 and rounds manually — identical on the MXU. In
        # interpret mode that is NOT identical: CPU XLA may reassociate
        # the K-sum differently between the two output types (measured:
        # one borderline fc7 spike flip), so interpret uses _linear's
        # exact bf16-preferred formulation instead.
        if interpret:
            y = jnp.dot(z.astype(jnp.bfloat16), w_ref[:],
                        preferred_element_type=jnp.bfloat16)
            return y.astype(jnp.float32)
        y = jnp.dot(z.astype(jnp.bfloat16), w_ref[:],
                    preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16).astype(jnp.float32)

    for j in range(tc):
        z6 = lif(v6, i6, cur_ref[j].astype(jnp.float32))
        z7 = lif(v7, i7, mm(z6, w7_ref))
        li(lic_v, lic_i, mm(z7, wc_ref))
        li(lib_v, lib_i, mm(z7, wb_ref))

        if collect_rates:
            c6_ref[:] = c6_ref[:] + jnp.broadcast_to(
                jnp.sum(z6, axis=1, keepdims=True), c6_ref.shape)
            c7_ref[:] = c7_ref[:] + jnp.broadcast_to(
                jnp.sum(z7, axis=1, keepdims=True), c7_ref.shape)

    @pl.when(t == num_steps // tc - 1)
    def _():
        outc_ref[:] = lic_v[:]
        outb_ref[:] = lib_v[:]
        if collect_rates:
            rc6_ref[:] = c6_ref[:]
            rc7_ref[:] = c7_ref[:]


def box_tail_pallas(
    cur6_all: jnp.ndarray,
    w7: jnp.ndarray,
    wc: jnp.ndarray,
    wb: jnp.ndarray,
    num_steps: int,
    collect_rates: bool = False,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Fused LIF/fc7/readout tail over precomputed fc6 currents.

    cur6_all: [T, R, rep] (cast to bf16 — the XLA tail consumes
    ``cur6_all.astype(compute_dtype)``, so this IS the production input);
    w7: [rep, rep]; wc: [rep, n_cls]; wb: [rep, n_reg].

    Returns (cls_logits [R, n_cls] f32, bbox_deltas [R, n_reg] f32,
    fc6_counts [R] f32 | None, fc7_counts [R] f32 | None) — bit-identical
    to ``heads._fastrcnn_snn_from_cur6`` at compute bf16 / state f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, r, rep = cur6_all.shape
    assert t == num_steps, (t, num_steps)
    n_cls, n_reg = wc.shape[1], wb.shape[1]
    assert tail_supported(rep, n_cls, n_reg, num_steps), (rep, n_cls, n_reg)

    tr = _TR
    r_pad = (r + tr - 1) // tr * tr
    # Padded rows carry zero currents -> zero states -> sliced off below.
    cur = jnp.pad(cur6_all.astype(jnp.bfloat16),
                  ((0, 0), (0, r_pad - r), (0, 0)))
    wc_p = jnp.pad(wc.astype(jnp.bfloat16), ((0, 0), (0, _LANE - n_cls)))
    wb_p = jnp.pad(wb.astype(jnp.bfloat16), ((0, 0), (0, _LANE - n_reg)))

    n_r = r_pad // tr
    kernel = functools.partial(
        _tail_kernel, num_steps=num_steps, collect_rates=collect_rates,
        interpret=interpret,
    )
    out_specs = [
        pl.BlockSpec((tr, _LANE), lambda i, t: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, _LANE), lambda i, t: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, _LANE), jnp.float32),
    ]
    if collect_rates:
        out_specs += out_specs[:2]
        out_shape += out_shape[:2]
    scratch = [
        pltpu.VMEM((tr, rep), jnp.float32),   # v6
        pltpu.VMEM((tr, rep), jnp.float32),   # i6
        pltpu.VMEM((tr, rep), jnp.float32),   # v7
        pltpu.VMEM((tr, rep), jnp.float32),   # i7
        pltpu.VMEM((tr, _LANE), jnp.float32),  # li cls v
        pltpu.VMEM((tr, _LANE), jnp.float32),  # li cls i
        pltpu.VMEM((tr, _LANE), jnp.float32),  # li bbox v
        pltpu.VMEM((tr, _LANE), jnp.float32),  # li bbox i
    ]
    if collect_rates:
        scratch += [
            pltpu.VMEM((tr, _LANE), jnp.float32),
            pltpu.VMEM((tr, _LANE), jnp.float32),
        ]
    tc = _choose_tc(num_steps)
    outs = pl.pallas_call(
        kernel,
        grid=(n_r, num_steps // tc),
        in_specs=[
            pl.BlockSpec((tc, tr, rep), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, rep), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, _LANE), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, _LANE), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(cur, w7.astype(jnp.bfloat16), wc_p, wb_p)
    cls_v = outs[0][:r, :n_cls]
    box_v = outs[1][:r, :n_reg]
    c6 = outs[2][:r, 0] if collect_rates else None
    c7 = outs[3][:r, 0] if collect_rates else None
    return cls_v, box_v, c6, c7
