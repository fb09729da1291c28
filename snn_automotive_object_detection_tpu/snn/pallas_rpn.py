"""Fused Pallas TPU kernel for the spiking RPN head (inference path).

Implements the full T_rpn-step unroll of the reference's ``RPNHeadSNN``
(/root/reference/rpn.py:33-121) for ONE FPN level inside one kernel:

  constant-current encoder -> 3x3 conv (256->256, bias-free) -> LIFCell
    -> fused 1x1 readout conv (256 -> A+4A) -> leaky integrators

The XLA ``lax.scan`` path (models/heads.py rpn_head_snn_apply) round-trips
every LIF/LIF state tensor through HBM once per timestep; at the flagship
operating point (768x1536, T=8, batch 2) that made the RPN head the largest
stage (~28 of 73 ms). Here everything is VMEM-resident across all T steps:

  * The kernel DMAs its own (th+2)-row halo window of the feature map per
    tile — no XLA-side window duplication pass.
  * Encoder spikes are generated from the CLOSED-FORM spike period of the
    constant-current encoder (exact for the usage in rpn.py:101). For a
    T-step run only periods <= T ever spike, and the period is a pure
    THRESHOLD COUNT: the membrane after m steps is x * (1 - a^m), so
    p = 1 + sum_m [x * (1 - a^m) <= v_th] over m = 1..T — T fused
    compares, no transcendentals, and exactly the integer
    snn/functional.py encoder_periods computes (the (1 - a^m) constants
    are XLA-folded from the same pow arithmetic). The kernel then carries
    a per-element countdown in the state dtype (integers <= T+1 are exact
    in bf16), so a step's spike plane costs zero HBM traffic.
  * The 3x3 conv is computed as 9 shifted [M, C] @ [C, C] matmuls over a
    row-flattened spatial layout. Each image row is padded to W_pad lanes
    (>= W + 2, multiple of 16) whose extra columns never spike;
    flattening (y, x) -> y * W_pad + x makes every conv tap a contiguous
    sublane-shifted slice. Tap wrap-around only ever lands in padding
    columns, and the 1x1 readout has no spatial mixing, so padding
    garbage never contaminates interior outputs (they are sliced away on
    the XLA side).
  * LIF / LI state, the 3x3 weights (1.2 MB bf16) and the fused 1x1
    readout weights all stay in VMEM across the T-step loop.

Numerics match the production XLA path (bf16 state, f32 MXU accumulation,
same norse-0.0.7 update ordering as snn/functional.py). A float32 variant
exists for parity testing (state_dtype=jnp.float32).

Round-3 additions: eval-time spike-rate accumulators run in-kernel
(collect_rates — two f32 reductions per step, so the energy CLIs get
kernel speed), and TRAINING runs through a custom VJP whose backward is
itself a Pallas kernel (see the "Training path" section below).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_automotive_object_detection_tpu.snn import functional as snnf

# Flat-row base offset: keeps every tap slice in-bounds and the dx=0 taps
# sublane-aligned (16 = bf16 sublane tile).
_BASE = 16
# VMEM budget for choosing the row-tile height (leaves headroom for Mosaic
# temporaries in the ~16 MB/core VMEM).
_VMEM_BUDGET = 12 * 1024 * 1024
# The threshold-count period needs one compare per step; cap where that
# stays trivially cheap (the reference sweeps T_rpn only up to 12).
_MAX_T = 32
# Software-pipelined step loop (see _run_level's `pipelined`). Default ON:
# measured e2e batch-2 53.9 vs 53.0 img/s (round 4, same session, fpn_pallas
# on) and 53.7 vs 51.8 with fpn_pallas off — the double-buffered accumulator
# lets Mosaic overlap step t+1's tap matmuls with step t's LIF VPU chain.
# RPN_PIPELINE=0 restores the serial loop for A/Bs.
_PIPELINE_DEFAULT = os.environ.get("RPN_PIPELINE", "1") == "1"
# Cross-image interleave experiment (VERDICT r4 #4b): pair two batch
# images per kernel instance so their independent step chains interleave.
# A/B knob only — see the "_rpn_x2_kernel" section for why EV is low.
_X2_DEFAULT = os.environ.get("RPN_X2", "0") == "1"
# Compute the encoder first-spike periods at the XLA level (pointwise, so
# XLA fuses the 8 compares into the FPN epilogue) and DMA the PERIOD plane
# into the kernel instead of raw features. The in-kernel period pass runs
# over (th+2)/th redundant halo rows — 2x at P2, whose VMEM budget forces
# th=2 — and is pure serial prologue per tile; precomputing it removes
# that VPU work and the xf/p f32 temporaries from the kernel for one extra
# HBM write of the period plane. Bit-identical: same f32 compare chain on
# the same state-dtype-rounded inputs, pad value = never (T+1).
# NOTE round 3 tried "XLA periods" BEFORE per-tile window DMA existed —
# that variant also paid an XLA halo row-gather + int-mod encoder; this
# one only moves the pointwise period computation.
_XLA_PERIODS_DEFAULT = os.environ.get("RPN_XLA_PERIODS", "0") == "1"

# (dy, dx) tap order must match the [3, 3, C, C] HWIO weight layout.
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_bytes(th: int, w_pad: int, c: int, sz: int, lsz: int,
                pipelined: bool = False, x_is_periods: bool = False) -> int:
    """Estimated VMEM use for a row-tile height of ``th`` (see kernel).
    sz = plane/weight itemsize, lsz = LIF state itemsize (f32 in the
    AMP-style mixed mode)."""
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)
    m = th * w_pad
    s_halo = (th + 2) * w_pad
    window = s_halo * c * sz               # DMA'd feature/period window
    per_cnt_z = 3 * s_alloc * c * sz       # period + countdown + spikes
    # xf + p f32 temporaries of the in-kernel period pass (absent when the
    # periods come precomputed via DMA)
    period_tmp = 0 if x_is_periods else 2 * s_halo * c * 4
    lif = 2 * m * c * lsz                  # v, i
    acc = m * c * 4                        # f32 conv accumulator
    if pipelined:
        acc *= 2                           # double-buffered accumulator
    ssum = m * c * 4                       # f32 LI-weighted spike accumulator
    out = 2 * m * 128 * sz                 # pipelined output blocks
    s_tmp = m * c * 4                      # f32 spike temp per step
    w = (9 * c * c + 128 * c) * sz
    return (window + per_cnt_z + period_tmp + lif + acc + ssum + out
            + s_tmp + w)


def _choose_tile_h(h: int, w_pad: int, c: int, sz: int, lsz: int,
                   pipelined: bool = False, x_is_periods: bool = False) -> int:
    """Largest row-tile height that fits the VMEM budget (capped at the
    padded image height so tiny upper FPN levels stay one tile)."""
    cap = _round_up(h, 2)
    for th in (64, 48, 32, 24, 16, 12, 8, 6, 4, 2):
        if th <= cap and _vmem_bytes(th, w_pad, c, sz, lsz, pipelined,
                                     x_is_periods) <= _VMEM_BUDGET:
            return th
    return 2


def _rpn_level_kernel(
    thr_ref,    # [T] f32 (scalar prefetch) — 1 - a^m membrane constants
    li_ref,     # [T] f32 (scalar prefetch) — LI readout coefficients a_t
    x_hbm,      # [N, HT, W_pad, C] state_dtype — padded features (ANY)
    w9_ref,     # [9, C, C]  state_dtype — 3x3 conv taps (dy-major)
    wout_ref,   # [C, 128]   state_dtype — fused 1x1 readout (padded)
    out_ref,    # [1, M, 128] state_dtype — final LI membrane
    *rest,      # [rate_ref [1, 8, 128] f32 when collect_rates] + scratches
    num_steps: int,
    n_th: int,
    tile_h: int,
    m_rows: int,
    w_pad: int,
    h_img: int = 0,
    w_img: int = 0,
    collect_rates: bool = False,
    pipelined: bool = False,
    x_is_periods: bool = False,
):
    # Scratches (after the optional rates output):
    #   xwin_ref  [th+2, W_pad, C] window scratch (DMA target)
    #   per_ref   [S_alloc, C] first-spike period (T+1 == never)
    #   cnt_ref   [S_alloc, C] countdown to next encoder spike
    #   z_ref     [S_alloc, C] this step's encoder spikes
    #   v_ref     [M, C]       LIF membrane
    #   i_ref     [M, C]       LIF synaptic current
    #   acc_ref   [M, C] f32   conv accumulator
    #   [acc2_ref [M, C] f32   second accumulator when pipelined]
    #   ssum_ref  [M, C] f32   LI-weighted spike accumulator
    #   dma_sem
    if collect_rates:
        rate_ref, rest = rest[0], rest[1:]
    if pipelined:
        (xwin_ref, per_ref, cnt_ref, z_ref, v_ref, i_ref, acc_ref, acc2_ref,
         ssum_ref, dma_sem) = rest
    else:
        (xwin_ref, per_ref, cnt_ref, z_ref, v_ref, i_ref, acc_ref, ssum_ref,
         dma_sem) = rest
    dt = snnf.DT
    tau_mem = dt * snnf.LIF_PARAMS.tau_mem_inv   # 0.1
    tau_syn = dt * snnf.LIF_PARAMS.tau_syn_inv   # 0.2
    # Plane/matmul dtype (encoder countdown, spikes, weights) vs LIF state
    # dtype: they differ in the AMP-style mixed mode (lif_state_dtype=f32,
    # VERDICT r3 #1) where only the carried v/i live in f32 — in VMEM that
    # costs capacity, not the HBM bandwidth it costs the XLA scan.
    sd = z_ref.dtype
    ld = v_ref.dtype
    # Thresholds as the XLA path sees them: rounded to the LIF state dtype
    # first (the f32 compares below then match the state arithmetic).
    v_th = float(np.asarray(snnf.LIF_PARAMS.v_th, dtype=np.dtype(ld)))
    enc_vth = float(snnf.ENCODER_PARAMS.v_th)    # 0.25

    r = pl.program_id(0)
    img = r // n_th
    row0 = (r % n_th) * tile_h

    dma = pltpu.make_async_copy(
        x_hbm.at[img, pl.ds(row0, tile_h + 2), :, :], xwin_ref, dma_sem
    )
    dma.start()

    never = float(num_steps + 1)
    per_ref[:] = jnp.full_like(per_ref, never)
    for ref in (v_ref, i_ref, ssum_ref):
        ref[:] = jnp.zeros_like(ref)

    dma.wait()
    s_halo = (tile_h + 2) * w_pad
    if x_is_periods:
        # The window IS the precomputed period plane (XLA-side pointwise
        # pass, RPN_XLA_PERIODS) — just place it at the haloed offset.
        per_ref[_BASE:_BASE + s_halo, :] = xwin_ref[:].reshape(s_halo, -1)
    else:
        # Closed-form first-spike period as a threshold count: the encoder
        # membrane after m steps of constant current x is x * (1 - a^m)
        # (snn/functional.py encoder_periods), so
        #   p = 1 + sum_{m=1..T} [x * (1 - a^m) <= v_th_enc]
        # — exactly encoder_periods' integer for p <= T, and "never" (> T)
        # otherwise, which is indistinguishable within a T-step run.
        xf = xwin_ref[:].reshape(s_halo, -1).astype(jnp.float32)
        p = jnp.ones_like(xf)
        for m in range(num_steps):
            p = p + (xf * thr_ref[m] <= enc_vth).astype(jnp.float32)
        per_ref[_BASE:_BASE + s_halo, :] = p.astype(sd)
    cnt_ref[:] = per_ref[:]

    if collect_rates:
        rloc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad, 1), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad, 1), 1)
        valid_mask = ((rloc + row0 < h_img) & (cloc >= 1)
                      & (cloc <= w_img)).astype(jnp.float32)

    def encoder_step(zc):
        # Encoder: countdown-to-spike. The compare runs in f32 — v5e Mosaic
        # lacks bf16 vector compares, and the bf16->f32 extension is exact.
        # (A compare-free max/fma formulation measured ~70% slower.)
        c = cnt_ref[:] - 1.0
        spike = c.astype(jnp.float32) < 0.5
        cnt_ref[:] = jnp.where(spike, per_ref[:], c)
        z_ref[:] = spike.astype(sd)
        if collect_rates:
            # Interior z slice = the (dy=0, dx=0) tap window; zero-padded
            # features never spike, so the z sum is exact unmasked.
            zin = z_ref[_BASE + w_pad:_BASE + w_pad + m_rows, :]
            zc = zc + jnp.sum(zin.astype(jnp.float32))
        return zc

    def conv_taps(acc):
        # 3x3 conv as 9 shifted matmuls on the row-flattened layout.
        for k, (dy, dx) in enumerate(_TAPS):
            start = _BASE + (1 + dy) * w_pad + dx
            part = jnp.dot(
                z_ref[start:start + m_rows, :],
                w9_ref[k],
                preferred_element_type=jnp.float32,
            )
            if k == 0:
                acc[:] = part
            else:
                acc[:] = acc[:] + part

    def lif_step(t, acc, sc):
        # LIF step (functional.py lif_feed_forward_step ordering). The
        # conv current is rounded to the plane dtype first (the XLA path's
        # bf16 conv output), then accumulated in the LIF state dtype.
        v_dec = v_ref[:] + tau_mem * (i_ref[:] - v_ref[:])
        i_dec = i_ref[:] - tau_syn * i_ref[:]
        s = (v_dec.astype(jnp.float32) - v_th > 0)
        v_ref[:] = jnp.where(s, 0.0, v_dec)
        i_ref[:] = i_dec + acc[:].astype(sd).astype(ld)

        # The LI readout is LINEAR in its per-step input currents, and the
        # 1x1 conv has no state — so v_T = conv1x1(sum_t a_t * s_t) with
        # scalar coefficients a_t = 0.1 * sum_{u=t..T} 0.9^(T-u) 0.8^(u-t)
        # (functional.py li_feed_forward_step unrolled). Accumulate the
        # weighted spikes in f32 and run ONE readout matmul after the loop
        # instead of a matmul + 6 LI passes per step.
        ssum_ref[:] = ssum_ref[:] + li_ref[t] * s.astype(jnp.float32)
        if collect_rates:
            # The LIF spikes s need masking: padding columns receive real
            # conv input through the +-1 taps (harmless for the sliced
            # output, garbage for a raw count) — mask to the valid
            # (row, col) region (SURVEY §2.2 in-kernel accumulators).
            sc = sc + jnp.sum(s.astype(jnp.float32).reshape(
                tile_h, w_pad, -1) * valid_mask)
        return sc

    if pipelined:
        # Software pipeline (statically unrolled): step t+1's encoder and
        # tap matmuls are issued BEFORE step t's LIF chain. The taps write
        # the other accumulator of a double-buffered pair, so the serial
        # LIF/ssum VPU ops carry no data dependency on the in-flight
        # matmuls and the in-order core can overlap them with the MXU.
        zc, sc = 0.0, 0.0
        accs = (acc_ref, acc2_ref)
        zc = encoder_step(zc)
        conv_taps(accs[0])
        for t in range(num_steps):
            if t + 1 < num_steps:
                zc = encoder_step(zc)
                conv_taps(accs[(t + 1) % 2])
            sc = lif_step(t, accs[t % 2], sc)
    else:
        def step(t, carry):
            zc, sc = carry
            zc = encoder_step(zc)
            conv_taps(acc_ref)
            sc = lif_step(t, acc_ref, sc)
            return (zc, sc)

        zc, sc = jax.lax.fori_loop(0, num_steps, step, (0.0, 0.0))
    out_ref[0] = jnp.dot(
        ssum_ref[:], wout_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(sd)
    if collect_rates:
        # [1, 8, 128] block (Mosaic requires the last two dims divisible by
        # (8, 128)); the counts live at sublane 0, lanes 0/1, zeros elsewhere.
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        rate_ref[:] = jnp.where((sub == 0) & (lane == 0), zc,
                                jnp.where((sub == 0) & (lane == 1), sc, 0.0))


def _li_coefficients(num_steps: int) -> np.ndarray:
    """LI readout coefficients: unrolling li_feed_forward_step (v' = 0.9v +
    0.1 i_jump, i' = 0.8 i_jump) gives v_T = sum_u a_u * cur_u with
    a_u = 0.1 * sum_{k=u..T} 0.9^(T-k) * 0.8^(k-u)  (u, k 1-indexed)."""
    tm = snnf.DT * snnf.LI_PARAMS.tau_mem_inv    # 0.1
    ts = snnf.DT * snnf.LI_PARAMS.tau_syn_inv    # 0.2
    return np.asarray([
        tm * sum((1.0 - tm) ** (num_steps - k) * (1.0 - ts) ** (k - u)
                 for k in range(u, num_steps + 1))
        for u in range(1, num_steps + 1)
    ], np.float32)


def _run_level(
    feat: jnp.ndarray,
    w9: jnp.ndarray,
    wout: jnp.ndarray,
    num_steps: int,
    num_anchors: int,
    state_dtype,
    interpret: bool,
    collect_rates: bool = False,
    lif_dtype=None,
    pipelined: Optional[bool] = None,
    xla_periods: Optional[bool] = None,
):
    """One FPN level through the fused kernel.

    feat: [N, H, W, C]; w9: [9, C, C]; wout: [C, 128] (A + 4A used cols).
    Returns (objectness [N, H, W, A] f32, bbox [N, H, W, 4A] f32) plus,
    when collect_rates, (encoder_rate [N], shared_rate [N]) — mean
    spikes/neuron/step in the reference convention (rpn.py:162-174).

    lif_dtype: dtype of the carried LIF v/i (None -> state_dtype). f32
    with bf16 state_dtype is the AMP-style mixed mode: matmul operands
    stay bf16, only the threshold-adjacent LIF state is exact.

    pipelined: software-pipeline the T-step loop (statically unrolled,
    double-buffered conv accumulator; see _rpn_level_kernel). Numerically
    identical — scheduling only. None -> _PIPELINE_DEFAULT.

    xla_periods: compute the encoder first-spike periods XLA-side (fused
    pointwise pass) and DMA the period plane instead of raw features.
    Bit-identical (same f32 compare chain on the same state-dtype-rounded
    inputs; pad = never). None -> _XLA_PERIODS_DEFAULT.
    """
    n, h, w, c = feat.shape
    lif_dtype = lif_dtype or state_dtype
    if pipelined is None:
        pipelined = _PIPELINE_DEFAULT
    if xla_periods is None:
        xla_periods = _XLA_PERIODS_DEFAULT
    sz = jnp.dtype(state_dtype).itemsize
    lsz = jnp.dtype(lif_dtype).itemsize
    w_pad = _round_up(w + 2, 16)
    th = _choose_tile_h(h, w_pad, c, sz, lsz, pipelined, xla_periods)
    n_th = -(-h // th)
    m_rows = th * w_pad
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)

    # Membrane constants 1 - a^m for m = 1..T, computed with the SAME XLA
    # pow arithmetic encoder_periods uses (folded at compile time).
    a = 1.0 - snnf.DT * snnf.ENCODER_PARAMS.tau_mem_inv
    thresholds = 1.0 - a ** jnp.arange(1, num_steps + 1, dtype=jnp.float32)
    li_coef = _li_coefficients(num_steps)

    if xla_periods:
        # Pointwise period plane, exactly the kernel's compare chain: round
        # features to the plane dtype (what the DMA'd window would hold),
        # extend to f32, count thresholds. XLA fuses this into the FPN
        # epilogue; pad with "never" (= what zero features compute to).
        xf = feat.astype(state_dtype).astype(jnp.float32)
        p = jnp.full(xf.shape, 1.0, jnp.float32)
        for m in range(num_steps):
            p = p + (xf * thresholds[m] <=
                     float(snnf.ENCODER_PARAMS.v_th)).astype(jnp.float32)
        x_pad = jnp.pad(
            p.astype(state_dtype),
            ((0, 0), (1, n_th * th - h + 1), (1, w_pad - w - 1), (0, 0)),
            constant_values=float(num_steps + 1),
        )
    else:
        # Zero-pad to the windowed layout: 1 halo row top/bottom, 1 halo
        # col left, width to W_pad, height to n_th*th. Zero features never
        # spike (x <= v_th_enc), matching the conv's zero padding and the
        # XLA path's period-255 padding.
        x_pad = jnp.pad(
            feat.astype(state_dtype),
            ((0, 0), (1, n_th * th - h + 1), (1, w_pad - w - 1), (0, 0)),
        )

    kernel = functools.partial(
        _rpn_level_kernel, num_steps=num_steps, n_th=n_th, tile_h=th,
        m_rows=m_rows, w_pad=w_pad, h_img=h, w_img=w,
        collect_rates=collect_rates, pipelined=pipelined,
        x_is_periods=xla_periods,
    )
    out_specs = [pl.BlockSpec((1, m_rows, 128), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n * n_th, m_rows, 128), state_dtype)]
    if collect_rates:
        # 8-sublane padded so the block satisfies Mosaic's (8, 128) rule;
        # only (sublane 0, lanes 0/1) carry the two counts.
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n * n_th, 8, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n * n_th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_pad, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((m_rows, c), lif_dtype),
            pltpu.VMEM((m_rows, c), lif_dtype),
        ] + [pltpu.VMEM((m_rows, c), jnp.float32)] * (3 if pipelined else 2)
        + [pltpu.SemaphoreType.DMA(())],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(thresholds, jnp.asarray(li_coef), x_pad,
      w9.astype(state_dtype), wout.astype(state_dtype))
    out = outs[0]

    a_n = num_anchors
    mem = out.reshape(n, n_th, th, w_pad, 128)[:, :, :, 1:w + 1, :5 * a_n]
    mem = mem.reshape(n, n_th * th, w, 5 * a_n)[:, :h].astype(jnp.float32)
    if not collect_rates:
        return mem[..., :a_n], mem[..., a_n:]
    counts = outs[1][:, 0].reshape(n, n_th, 128).sum(axis=1)  # [N, 128]
    denom = float(num_steps * h * w * c)
    enc_rate = counts[:, 0] / denom
    shared_rate = counts[:, 1] / denom
    return mem[..., :a_n], mem[..., a_n:], enc_rate, shared_rate


# ====================================================================
# Cross-image interleave experiment (VERDICT r4 #4b): one kernel instance
# runs the SAME row-tile of TWO batch images, statically interleaving the
# two independent T-step chains so Mosaic may overlap image A's serial
# VPU LIF ops with image B's MXU tap matmuls. The round-3 two-SPATIAL-tile
# interleave measured within noise ("Mosaic schedules serially"); the
# per-step VPU ops here are long-vector throughput-bound, so the expected
# value is low — this variant exists to measure that claim cross-image
# (RPN_X2=1, tools/ximg_probe.py) rather than assert it. Doubled per-image
# scratches halve the row-tile height, so halo/period overhead doubles.
#
# MEASURED (v5e, round 5) — negative, knob stays off:
#  - P2 (192x384) and P3 (96x192) are VMEM-INFEASIBLE: even the minimal
#    th=2 paired tile needs ~24.1 MB scoped VMEM vs the 16 MB limit (two
#    images' f32 LIF/accumulator planes + encoder f32 temporaries cannot
#    co-reside), so the production levels that carry ~90% of RPN time
#    cannot pair at all (they fall back to the per-image kernel).
#  - On the three levels where pairing fits (P4-P6), the full 5-level head
#    measures 14.27 ms paired vs 13.91 ms per-image (exact=True) — the
#    interleave is ~noise-slower even where it compiles, consistent with
#    the round-3 finding that Mosaic schedules serially.
# ====================================================================


def _vmem_bytes_x2(th: int, w_pad: int, c: int, sz: int, lsz: int) -> int:
    """Two images' pipelined working set sharing one copy of the weights."""
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)
    m = th * w_pad
    s_halo = (th + 2) * w_pad
    per_img = (
        s_halo * c * sz            # DMA'd feature window
        + 3 * s_alloc * c * sz     # period + countdown + spikes
        + 2 * s_halo * c * 4       # xf + p f32 period temporaries
        + 2 * m * c * lsz          # v, i
        + 2 * m * c * 4            # double-buffered conv accumulator
        + m * c * 4                # ssum
        + m * c * 4                # f32 spike temp per step
        + 2 * m * 128 * sz         # pipelined output half-blocks
    )
    w = (9 * c * c + 128 * c) * sz
    return 2 * per_img + w


def _choose_tile_h_x2(h: int, w_pad: int, c: int, sz: int, lsz: int):
    """Largest feasible paired row-tile, or None when even th=2 exceeds
    the VMEM budget (measured on v5e at the production P2 level: the
    minimal tile's two-image working set is ~24.1 MB vs the 16 MB scoped
    limit — two f32 LIF/accumulator plane sets cannot co-reside)."""
    cap = _round_up(h, 2)
    for th in (64, 48, 32, 24, 16, 12, 8, 6, 4, 2):
        if th <= cap and _vmem_bytes_x2(th, w_pad, c, sz, lsz) <= _VMEM_BUDGET:
            return th
    return None


def _x2_feasible(feat_shape, state_dtype, lif_dtype=None) -> bool:
    n, h, w, c = feat_shape
    if n % 2 != 0:
        return False
    sz = jnp.dtype(state_dtype).itemsize
    lsz = jnp.dtype(lif_dtype or state_dtype).itemsize
    return _choose_tile_h_x2(h, _round_up(w + 2, 16), c, sz, lsz) is not None


def _rpn_x2_kernel(
    thr_ref,    # [T] f32 (scalar prefetch)
    li_ref,     # [T] f32 (scalar prefetch)
    x_hbm,      # [N, HT, W_pad, C] state_dtype (ANY)
    w9_ref,     # [9, C, C]  state_dtype
    wout_ref,   # [C, 128]   state_dtype
    out_ref,    # [1, 2, M, 128] state_dtype — the pair's LI membranes
    *rest,
    num_steps: int,
    n_th: int,
    tile_h: int,
    m_rows: int,
    w_pad: int,
):
    """Pipelined pair-of-images variant of _rpn_level_kernel.

    Scratches come interleaved per image: (xwin, per, cnt, z, v, i, acc0,
    acc1, ssum) x 2, then two DMA semaphores. Numerics are bit-identical
    to _run_level per image (same step math, same dtypes)."""
    per_img = [rest[0:18:2], rest[1:18:2]]
    sems = rest[18:20]
    dt = snnf.DT
    tau_mem = dt * snnf.LIF_PARAMS.tau_mem_inv
    tau_syn = dt * snnf.LIF_PARAMS.tau_syn_inv
    sd = per_img[0][3].dtype
    ld = per_img[0][4].dtype
    v_th = float(np.asarray(snnf.LIF_PARAMS.v_th, dtype=np.dtype(ld)))
    enc_vth = float(snnf.ENCODER_PARAMS.v_th)

    r = pl.program_id(0)
    pair = r // n_th
    row0 = (r % n_th) * tile_h
    never = float(num_steps + 1)
    s_halo = (tile_h + 2) * w_pad

    dmas = []
    for p in range(2):
        xwin_ref = per_img[p][0]
        dma = pltpu.make_async_copy(
            x_hbm.at[2 * pair + p, pl.ds(row0, tile_h + 2), :, :],
            xwin_ref, sems[p],
        )
        dma.start()
        dmas.append(dma)
    for p in range(2):
        _, per_ref, cnt_ref, z_ref, v_ref, i_ref, a0, a1, ssum_ref = \
            per_img[p]
        per_ref[:] = jnp.full_like(per_ref, never)
        v_ref[:] = jnp.zeros_like(v_ref)
        i_ref[:] = jnp.zeros_like(i_ref)
        ssum_ref[:] = jnp.zeros_like(ssum_ref)
    for p in range(2):
        xwin_ref, per_ref, cnt_ref = per_img[p][0:3]
        dmas[p].wait()
        xf = xwin_ref[:].reshape(s_halo, -1).astype(jnp.float32)
        pp = jnp.ones_like(xf)
        for m in range(num_steps):
            pp = pp + (xf * thr_ref[m] <= enc_vth).astype(jnp.float32)
        per_ref[_BASE:_BASE + s_halo, :] = pp.astype(sd)
        cnt_ref[:] = per_ref[:]

    def encoder_step(p):
        _, per_ref, cnt_ref, z_ref = per_img[p][0:4]
        c = cnt_ref[:] - 1.0
        spike = c.astype(jnp.float32) < 0.5
        cnt_ref[:] = jnp.where(spike, per_ref[:], c)
        z_ref[:] = spike.astype(sd)

    def conv_taps(p, acc):
        z_ref = per_img[p][3]
        for k, (dy, dx) in enumerate(_TAPS):
            start = _BASE + (1 + dy) * w_pad + dx
            part = jnp.dot(
                z_ref[start:start + m_rows, :],
                w9_ref[k],
                preferred_element_type=jnp.float32,
            )
            if k == 0:
                acc[:] = part
            else:
                acc[:] = acc[:] + part

    def lif_step(p, t, acc):
        v_ref, i_ref = per_img[p][4:6]
        ssum_ref = per_img[p][8]
        v_dec = v_ref[:] + tau_mem * (i_ref[:] - v_ref[:])
        i_dec = i_ref[:] - tau_syn * i_ref[:]
        s = (v_dec.astype(jnp.float32) - v_th > 0)
        v_ref[:] = jnp.where(s, 0.0, v_dec)
        i_ref[:] = i_dec + acc[:].astype(sd).astype(ld)
        ssum_ref[:] = ssum_ref[:] + li_ref[t] * s.astype(jnp.float32)

    accs = [per_img[p][6:8] for p in range(2)]
    for p in range(2):
        encoder_step(p)
        conv_taps(p, accs[p][0])
    for t in range(num_steps):
        if t + 1 < num_steps:
            for p in range(2):
                encoder_step(p)
                conv_taps(p, accs[p][(t + 1) % 2])
        for p in range(2):
            lif_step(p, t, accs[p][t % 2])
    for p in range(2):
        ssum_ref = per_img[p][8]
        out_ref[0, p] = jnp.dot(
            ssum_ref[:], wout_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(sd)


def _run_level_x2(
    feat: jnp.ndarray,
    w9: jnp.ndarray,
    wout: jnp.ndarray,
    num_steps: int,
    num_anchors: int,
    state_dtype,
    interpret: bool,
    lif_dtype=None,
):
    """Cross-image-paired _run_level (even batch, no rate collection)."""
    n, h, w, c = feat.shape
    assert n % 2 == 0
    lif_dtype = lif_dtype or state_dtype
    sz = jnp.dtype(state_dtype).itemsize
    lsz = jnp.dtype(lif_dtype).itemsize
    w_pad = _round_up(w + 2, 16)
    th = _choose_tile_h_x2(h, w_pad, c, sz, lsz)
    assert th is not None, "x2 infeasible for this level (gate upstream)"
    n_th = -(-h // th)
    m_rows = th * w_pad
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)

    x_pad = jnp.pad(
        feat.astype(state_dtype),
        ((0, 0), (1, n_th * th - h + 1), (1, w_pad - w - 1), (0, 0)),
    )
    a = 1.0 - snnf.DT * snnf.ENCODER_PARAMS.tau_mem_inv
    thresholds = 1.0 - a ** jnp.arange(1, num_steps + 1, dtype=jnp.float32)
    li_coef = _li_coefficients(num_steps)

    kernel = functools.partial(
        _rpn_x2_kernel, num_steps=num_steps, n_th=n_th, tile_h=th,
        m_rows=m_rows, w_pad=w_pad,
    )
    def _per_image():
        return [
            pltpu.VMEM((th + 2, w_pad, c), state_dtype),   # xwin
            pltpu.VMEM((s_alloc, c), state_dtype),         # per
            pltpu.VMEM((s_alloc, c), state_dtype),         # cnt
            pltpu.VMEM((s_alloc, c), state_dtype),         # z
            pltpu.VMEM((m_rows, c), lif_dtype),            # v
            pltpu.VMEM((m_rows, c), lif_dtype),            # i
            pltpu.VMEM((m_rows, c), jnp.float32),          # acc0
            pltpu.VMEM((m_rows, c), jnp.float32),          # acc1
            pltpu.VMEM((m_rows, c), jnp.float32),          # ssum
        ]
    # Interleaved (ref0_img0, ref0_img1, ref1_img0, ...) — see kernel unpack.
    scratch = [s for pair in zip(_per_image(), _per_image()) for s in pair]
    scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // 2 * n_th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 2, m_rows, 128),
                                lambda i, *_: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n // 2 * n_th, 2, m_rows, 128),
                                        state_dtype)],
        interpret=interpret,
    )(thresholds, jnp.asarray(li_coef), x_pad,
      w9.astype(state_dtype), wout.astype(state_dtype))[0]

    a_n = num_anchors
    # [P, n_th, 2, M, 128] -> [P, 2, n_th, M, 128] -> [N, H, W, 5A] slices
    mem = out.reshape(n // 2, n_th, 2, m_rows, 128).swapaxes(1, 2)
    mem = mem.reshape(n, n_th, th, w_pad, 128)[:, :, :, 1:w + 1, :5 * a_n]
    mem = mem.reshape(n, n_th * th, w, 5 * a_n)[:, :h].astype(jnp.float32)
    return mem[..., :a_n], mem[..., a_n:]


# ====================================================================
# Training path: custom VJP with a Pallas backward kernel.
#
# Gradients flow only into the 3x3 conv and the fused 1x1 readout weights:
# the encoder is parameterless and the backbone features are frozen
# (reference generalized_rcnn.py:93-94 wraps the backbone in no_grad and
# detector.py stop_gradients the features), so dL/dfeat is returned as
# zeros and the backward never needs a transposed-input conv.
#
# The backward kernel re-derives everything it needs per tile instead of
# spilling from the forward (whose VMEM-resident speed is the point):
#   phase 0: DMA the same feature window, recompute encoder periods
#            (threshold-count form, chunked f32 temporaries)
#   phase 1: replay the LIF forward, storing the T decayed-membrane planes
#            v_d(t) in VMEM and accumulating ssum = sum_t a_t * s_t
#   phase 2: reverse-mode sweep t = T-1..0 with the SuperSpike surrogate
#            (snn/functional.py:63-84), accumulating
#              dw9[k]  += z_t[tap k slice]^T @ dc_t      (9 matmuls/step)
#              dwout   += ssum^T @ g                      (once per tile)
#            into revisited output blocks shared across all grid tiles.
#            Encoder spikes are regenerated by a REVERSED countdown: the
#            forward countdown ends at c_T = p - (T mod p), and going
#            backwards "spike iff c == p, then c <- 1, else c <- c + 1"
#            reproduces z_t exactly (integers <= T+1 are exact in bf16).
# ====================================================================


def _vmem_bytes_bwd(th: int, w_pad: int, c: int, sz: int, t: int,
                    lsz: int) -> int:
    m = th * w_pad
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)
    window = (th + 2) * w_pad * c * sz
    per_cnt_z = 3 * s_alloc * c * sz
    ptmp = 2 * _PERIOD_CHUNK * c * 4          # chunked f32 period temps
    vdbuf = t * m * c * lsz                   # replayed decayed membranes
    lif = 2 * m * c * lsz
    f32_planes = 6 * m * c * 4                # acc, gw, lv, li, ssum, temps
    g_in = 2 * m * 128 * 4                    # double-buffered input block
    weights = (9 * c * c + 128 * c) * sz
    outs = (9 * c * c + 128 * c) * 4          # revisited f32 accumulators
    return (window + per_cnt_z + ptmp + vdbuf + lif + f32_planes + g_in
            + weights + outs)


_PERIOD_CHUNK = 512  # rows per f32 period-computation chunk (bwd kernel)


def _choose_tile_h_bwd(h: int, w_pad: int, c: int, sz: int, t: int,
                       lsz: int) -> int:
    cap = _round_up(h, 2)
    for th in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if th <= cap and _vmem_bytes_bwd(th, w_pad, c, sz, t,
                                         lsz) <= _VMEM_BUDGET:
            return th
    return 1


def _rpn_level_bwd_kernel(
    thr_ref,    # [T] f32 (scalar prefetch) — 1 - a^m membrane constants
    li_ref,     # [T] f32 (scalar prefetch) — LI readout coefficients a_t
    x_hbm,      # [N, HT, W_pad, C] state_dtype — padded features (ANY)
    w9_ref,     # [9, C, C]  state_dtype — 3x3 conv taps
    woutT_ref,  # [128, C]   state_dtype — transposed fused readout
    g_ref,      # [1, M, 128] f32 — output cotangent tile
    dw9_ref,    # [9, C, C] f32 out — revisited accumulator
    dwout_ref,  # [C, 128] f32 out — revisited accumulator
    xwin_ref,   # [th+2, W_pad, C] window scratch (DMA target)
    per_ref,    # [S_alloc, C] first-spike period
    cnt_ref,    # [S_alloc, C] countdown (forward then reversed)
    z_ref,      # [S_alloc, C] current step's encoder spikes
    vd_ref,     # [T, M, C]    decayed LIF membranes from the replay
    v_ref,      # [M, C]       LIF membrane (replay)
    i_ref,      # [M, C]       LIF synaptic current (replay)
    acc_ref,    # [M, C] f32   conv accumulator (replay)
    ssum_ref,   # [M, C] f32   LI-weighted spike accumulator
    gw_ref,     # [M, C] f32   g @ wout^T
    lv_ref,     # [M, C] f32   membrane cotangent
    lam_ref,    # [M, C] f32   current cotangent
    dma_sem,
    *,
    num_steps: int,
    n_th: int,
    tile_h: int,
    m_rows: int,
    w_pad: int,
):
    dt = snnf.DT
    tau_mem = dt * snnf.LIF_PARAMS.tau_mem_inv   # 0.1
    tau_syn = dt * snnf.LIF_PARAMS.tau_syn_inv   # 0.2
    alpha = float(snnf.LIF_PARAMS.alpha)
    # Plane/matmul dtype vs LIF state dtype — they differ in the AMP-style
    # mixed mode (lif_dtype=f32), mirroring the forward kernel exactly so
    # the replayed spike trains match the forward's.
    sd = z_ref.dtype
    ld = v_ref.dtype
    v_th = float(np.asarray(snnf.LIF_PARAMS.v_th, dtype=np.dtype(ld)))
    enc_vth = float(snnf.ENCODER_PARAMS.v_th)

    r = pl.program_id(0)
    img = r // n_th
    row0 = (r % n_th) * tile_h

    dma = pltpu.make_async_copy(
        x_hbm.at[img, pl.ds(row0, tile_h + 2), :, :], xwin_ref, dma_sem
    )
    dma.start()

    @pl.when(r == 0)
    def _init_outs():
        dw9_ref[:] = jnp.zeros_like(dw9_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)

    never = float(num_steps + 1)
    per_ref[:] = jnp.full_like(per_ref, never)
    for ref in (v_ref, i_ref, ssum_ref, lv_ref, lam_ref):
        ref[:] = jnp.zeros_like(ref)

    dma.wait()
    # Phase 0: encoder periods (threshold count), chunked to bound the f32
    # temporaries (CLAUDE.md: Mosaic accounts kernel-internal temps).
    s_halo = (tile_h + 2) * w_pad
    xflat = xwin_ref[:].reshape(s_halo, -1)
    for c0 in range(0, s_halo, _PERIOD_CHUNK):
        cl = min(_PERIOD_CHUNK, s_halo - c0)
        xf = xflat[c0:c0 + cl].astype(jnp.float32)
        p = jnp.ones_like(xf)
        for m in range(num_steps):
            p = p + (xf * thr_ref[m] <= enc_vth).astype(jnp.float32)
        per_ref[_BASE + c0:_BASE + c0 + cl, :] = p.astype(sd)
    cnt_ref[:] = per_ref[:]

    # Phase 1: forward replay — countdown encoder, 9-tap conv, LIF; store
    # each step's decayed membrane and the LI-weighted spike sum.
    def replay(t, _):
        c = cnt_ref[:] - 1.0
        spike = c.astype(jnp.float32) < 0.5
        cnt_ref[:] = jnp.where(spike, per_ref[:], c)
        z_ref[:] = spike.astype(sd)

        for k, (dy, dx) in enumerate(_TAPS):
            start = _BASE + (1 + dy) * w_pad + dx
            part = jnp.dot(
                z_ref[start:start + m_rows, :], w9_ref[k],
                preferred_element_type=jnp.float32,
            )
            if k == 0:
                acc_ref[:] = part
            else:
                acc_ref[:] = acc_ref[:] + part

        v_dec = v_ref[:] + tau_mem * (i_ref[:] - v_ref[:])
        i_dec = i_ref[:] - tau_syn * i_ref[:]
        vd_ref[pl.ds(t, 1)] = v_dec[None]
        s = (v_dec.astype(jnp.float32) - v_th > 0)
        v_ref[:] = jnp.where(s, 0.0, v_dec)
        # Conv current rounded to the plane dtype first, then accumulated
        # in the LIF state dtype (same ordering as the forward kernel).
        i_ref[:] = i_dec + acc_ref[:].astype(sd).astype(ld)
        ssum_ref[:] = ssum_ref[:] + li_ref[t] * s.astype(jnp.float32)
        return ()

    jax.lax.fori_loop(0, num_steps, replay, ())

    # Phase 2: reverse sweep. cnt_ref now holds c_T = p - (T mod p).
    g = g_ref[0]
    gw_ref[:] = jnp.dot(
        g.astype(sd), woutT_ref[:], preferred_element_type=jnp.float32
    )

    def reverse(idx, _):
        t = num_steps - 1 - idx
        # Reversed countdown: spike iff c == p, then c <- 1 else c + 1.
        d = cnt_ref[:]
        spike = d.astype(jnp.float32) >= per_ref[:].astype(jnp.float32) - 0.5
        cnt_ref[:] = jnp.where(spike, jnp.ones_like(d), d + 1.0)
        z_ref[:] = spike.astype(sd)

        # dc_t = lambda_i (cotangent of i_t): dw9[k] += z_shift^T @ dc.
        dc = lam_ref[:].astype(sd)
        for k, (dy, dx) in enumerate(_TAPS):
            start = _BASE + (1 + dy) * w_pad + dx
            dw9_ref[k] = dw9_ref[k] + jax.lax.dot_general(
                z_ref[start:start + m_rows, :], dc,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        vd = vd_ref[pl.ds(t, 1)][0].astype(jnp.float32)
        s = (vd - v_th > 0).astype(jnp.float32)
        u = vd - v_th
        sp = 1.0 / (alpha * jnp.abs(u) + 1.0) ** 2          # SuperSpike
        ds = li_ref[t] * gw_ref[:] - vd * lv_ref[:]
        dvd = (1.0 - s) * lv_ref[:] + ds * sp
        lv_ref[:] = (1.0 - tau_mem) * dvd
        lam_ref[:] = tau_mem * dvd + (1.0 - tau_syn) * lam_ref[:]
        return ()

    jax.lax.fori_loop(0, num_steps, reverse, ())

    dwout_ref[:] = dwout_ref[:] + jax.lax.dot_general(
        ssum_ref[:], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _run_level_bwd(
    feat: jnp.ndarray,
    w9: jnp.ndarray,
    wout: jnp.ndarray,
    do: jnp.ndarray,
    db: jnp.ndarray,
    num_steps: int,
    state_dtype,
    interpret: bool,
    lif_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward pass of one level: cotangents (do, db) -> (dw9, dwout).

    lif_dtype: dtype of the replayed LIF v/i and stored decayed-membrane
    planes (None -> state_dtype); f32 with bf16 state_dtype is the
    AMP-style mixed mode, matching the forward kernel's lif_dtype."""
    n, h, w, c = feat.shape
    lif_dtype = lif_dtype or state_dtype
    a5 = do.shape[-1] + db.shape[-1]
    sz = jnp.dtype(state_dtype).itemsize
    lsz = jnp.dtype(lif_dtype).itemsize
    w_pad = _round_up(w + 2, 16)
    th = _choose_tile_h_bwd(h, w_pad, c, sz, num_steps, lsz)
    n_th = -(-h // th)
    m_rows = th * w_pad
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 1, 16)

    x_pad = jnp.pad(
        feat.astype(state_dtype),
        ((0, 0), (1, n_th * th - h + 1), (1, w_pad - w - 1), (0, 0)),
    )
    # Cotangent tiles in the kernel's row-flattened layout (transpose of the
    # forward's interior slice: padded rows/cols get zero cotangent).
    g5 = jnp.concatenate([do, db], axis=-1).astype(jnp.float32)
    g_tiles = jnp.pad(
        g5, ((0, 0), (0, n_th * th - h), (1, w_pad - w - 1), (0, 128 - a5))
    ).reshape(n * n_th, m_rows, 128)

    a = 1.0 - snnf.DT * snnf.ENCODER_PARAMS.tau_mem_inv
    thresholds = 1.0 - a ** jnp.arange(1, num_steps + 1, dtype=jnp.float32)
    li_coef = _li_coefficients(num_steps)

    kernel = functools.partial(
        _rpn_level_bwd_kernel, num_steps=num_steps, n_th=n_th, tile_h=th,
        m_rows=m_rows, w_pad=w_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n * n_th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_rows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, c, c), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_pad, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((s_alloc, c), state_dtype),
            pltpu.VMEM((num_steps, m_rows, c), lif_dtype),
            pltpu.VMEM((m_rows, c), lif_dtype),
            pltpu.VMEM((m_rows, c), lif_dtype),
            pltpu.VMEM((m_rows, c), jnp.float32),
            pltpu.VMEM((m_rows, c), jnp.float32),
            pltpu.VMEM((m_rows, c), jnp.float32),
            pltpu.VMEM((m_rows, c), jnp.float32),
            pltpu.VMEM((m_rows, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dw9, dwout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((9, c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        interpret=interpret,
    )(thresholds, jnp.asarray(li_coef), x_pad, w9.astype(state_dtype),
      jnp.transpose(wout).astype(state_dtype), g_tiles)
    return dw9, dwout


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _level_train(num_steps, num_anchors, state_dtype, interpret, lif_dtype,
                 feat, w9, wout):
    """Differentiable fused RPN level (forward = the inference kernel)."""
    return _run_level(feat, w9, wout, num_steps, num_anchors, state_dtype,
                      interpret, lif_dtype=lif_dtype)


def _level_train_fwd(num_steps, num_anchors, state_dtype, interpret,
                     lif_dtype, feat, w9, wout):
    out = _run_level(feat, w9, wout, num_steps, num_anchors, state_dtype,
                     interpret, lif_dtype=lif_dtype)
    return out, (feat, w9, wout)


def _level_train_bwd(num_steps, num_anchors, state_dtype, interpret,
                     lif_dtype, res, cts):
    feat, w9, wout = res
    do, db = cts
    dw9, dwout = _run_level_bwd(
        feat, w9, wout, do, db, num_steps, state_dtype, interpret,
        lif_dtype=lif_dtype,
    )
    # Features are frozen by reference semantics (see module comment); a
    # zero cotangent keeps the contract explicit if stop_gradient is ever
    # removed upstream.
    return (jnp.zeros_like(feat), dw9.astype(w9.dtype),
            dwout.astype(wout.dtype))


_level_train.defvjp(_level_train_fwd, _level_train_bwd)


def rpn_head_snn_pallas_train_apply(
    params,
    features: List[jnp.ndarray],
    num_steps: int,
    state_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    lif_state_dtype=None,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], None]:
    """Differentiable drop-in for heads.rpn_head_snn_apply at training time.

    Forward values are the fused Pallas kernel's; the custom backward kernel
    reproduces the XLA scan's surrogate-gradient chain for the shared 3x3
    conv and the 1x1 readouts (feature cotangents are zero — the backbone is
    always frozen). Rates are not collected.

    lif_state_dtype=jnp.float32 with bf16 state_dtype is the AMP-style
    mixed mode (VERDICT r4 #2): forward AND backward-replay LIF v/i run in
    f32 while every matmul operand stays bf16 — the reference's training
    numerics (train.py:79/165 autocast GEMMs, norse f32 states) at fused-
    kernel speed instead of the ~1.6x-slower XLA train scan.
    """
    assert num_steps <= _MAX_T
    n_anch = params["conv_cls"]["w"].shape[-1]
    assert 5 * n_anch <= 128
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w_shared = params["shared_conv"]["w"]
    c = w_shared.shape[2]
    a = n_anch
    w9 = w_shared.reshape(9, c, c)
    wout = jnp.concatenate(
        [params["conv_cls"]["w"], params["conv_bbox"]["w"]], axis=-1
    ).reshape(c, 5 * a)
    wout = jnp.pad(wout, ((0, 0), (0, 128 - 5 * a)))

    logits, bbox_reg = [], []
    for feat in features:
        o, b = _level_train(num_steps, a, state_dtype, interpret,
                            lif_state_dtype, feat, w9, wout)
        logits.append(o)
        bbox_reg.append(b)
    return logits, bbox_reg, None


def rpn_head_snn_pallas_apply(
    params,
    features: List[jnp.ndarray],
    num_steps: int,
    state_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    collect_rates: bool = False,
    lif_state_dtype=None,
):
    """Drop-in inference replacement for heads.rpn_head_snn_apply.

    lif_state_dtype=jnp.float32 with bf16 state_dtype is the AMP-style
    mixed mode (VERDICT r3 #1): only the carried LIF v/i run in f32 (the
    encoder is closed-form-exact and the LI readout already accumulates in
    f32, so this makes the whole kernel state-exact while every matmul
    operand stays bf16).

    Same outputs (objectness / bbox lists, rates). Spike-rate accumulators
    run IN-KERNEL when collect_rates (two f32 reductions per step; the
    energy-analysis CLIs get kernel-path speed — SURVEY §2.2 plan). The
    rates dict matches the XLA path: {"encoder", "shared"}: [L, N].
    Inference kernel is forward-only — training uses the custom-VJP
    rpn_head_snn_pallas_train_apply.
    """
    assert num_steps <= _MAX_T, (
        f"threshold-count encoder supports T <= {_MAX_T}"
    )
    n_anch = params["conv_cls"]["w"].shape[-1]
    assert 5 * n_anch <= 128, (
        f"fused 128-lane readout supports at most 25 anchors per location "
        f"(got {n_anch}); widen wout padding in pallas_rpn.py to use more"
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w_shared = params["shared_conv"]["w"]          # [3, 3, C, C]
    c = w_shared.shape[2]
    a = params["conv_cls"]["w"].shape[-1]
    w9 = w_shared.reshape(9, c, c)
    wout = jnp.concatenate(
        [params["conv_cls"]["w"], params["conv_bbox"]["w"]], axis=-1
    ).reshape(c, 5 * a)
    wout = jnp.pad(wout, ((0, 0), (0, 128 - 5 * a)))

    logits, bbox_reg = [], []
    enc_rates, shared_rates = [], []
    for feat in features:
        if (_X2_DEFAULT and not collect_rates
                and _x2_feasible(feat.shape, state_dtype, lif_state_dtype)):
            res = _run_level_x2(feat, w9, wout, num_steps, a, state_dtype,
                                interpret, lif_dtype=lif_state_dtype)
        else:
            res = _run_level(feat, w9, wout, num_steps, a, state_dtype,
                             interpret, collect_rates=collect_rates,
                             lif_dtype=lif_state_dtype)
        logits.append(res[0])
        bbox_reg.append(res[1])
        if collect_rates:
            enc_rates.append(res[2])
            shared_rates.append(res[3])
    rates = None
    if collect_rates:
        rates = {"encoder": jnp.stack(enc_rates, axis=0),
                 "shared": jnp.stack(shared_rates, axis=0)}  # [L, N]
    return logits, bbox_reg, rates
