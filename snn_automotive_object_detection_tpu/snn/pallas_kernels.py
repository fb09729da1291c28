"""Fused Pallas TPU kernel for the spiking FC box head.

Implements the full T_det-step unroll of the reference's
``FastRCNNPredictorSNNFull`` (/root/reference/faster_rcnn.py:470-516) inside
ONE kernel per RoI tile:

  encoder spikes (closed-form periods, precomputed on the XLA side)
    -> fc6 GEMM (w6 streamed from HBM in K-chunks, double-buffered)
    -> LIF6 -> fc7 GEMM (w7 VMEM-resident) -> LIF7
    -> cls/bbox GEMMs -> leaky-integrator readout

All LIF/LI state lives in VMEM for the whole T-step scan — nothing round-
trips HBM between steps. Only w6 (too big for VMEM at 12544x1024) and the
encoder period map stream per step.

The grid iterates RoI tiles of R_TILE rows; within a tile a fori_loop runs
the T steps. fp32 accumulation on the MXU, bf16 storage.

STATUS — RETIRED as a design note (round 2 verdict follow-up). Measured on
v5e at R=2048, T=12:

  * this kernel:                       50.5 ms
  * XLA ``lax.scan`` (bf16 state):      7.6 ms   <- production path
  * stacked-T fc6 GEMM reformulation:  23.0 ms   (heads.fastrcnn_snn_apply
    precompute_fc6=True — fc6 for all T steps as ONE [T*R, K] @ [K, H]
    GEMM, weight read once)

Why each loses to the scan:
  * Here the ~16 MB VMEM cannot hold the 25.7 MB fc6 weight, so each RoI
    tile re-streams it T times (16 tiles x 12 steps x 25.7 MB ~ 4.9 GB) —
    more traffic than the scan's entire footprint (~2.7 GB: z planes,
    encoder membrane, weights).
  * The weight-stationary stacked-GEMM variant removes the re-streaming
    (w6 read once + z_all 1.2 GB) but pays ~15 ms in uint8 period-map mods
    and z_all materialisation; the closed-form encoder is a net loss at XLA
    level on this part (same finding as the RPN head's fast_encoder flag).
  * The scan itself sits at its HBM roofline: ~2.7 GB / 819 GB/s + 3.2 ms
    of fc6 MXU time ~= 7 ms, which is what it measures. There is no
    headroom left worth a fused kernel at these shapes.

Contrast with the RPN head, where the fused Pallas kernel (pallas_rpn.py)
DOES win ~1.8x: its weights fit VMEM entirely and the closed-form encoder
runs as an in-VMEM countdown rather than per-step XLA mods.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_automotive_object_detection_tpu.snn import functional as snnf

R_TILE = 128
K_CHUNK = 1792  # 12544 = 7 * 1792; must be a multiple of the 128 lane width


def _round_up(x, m):
    return (x + m - 1) // m * m


def _head_kernel(
    periods_ref,   # [R_TILE, K] int16 (VMEM block; Mosaic lacks i8 vector loads)
    w6_hbm,        # [K, H] bf16 (stays in HBM; manually DMA'd)
    w7_ref,        # [H, H] bf16 (VMEM)
    wc_ref,        # [H, C_pad] bf16 (VMEM)
    wb_ref,        # [H, B_pad] bf16 (VMEM)
    cls_out_ref,   # [R_TILE, C_pad] f32
    reg_out_ref,   # [R_TILE, B_pad] f32
    rate6_ref,     # [R_TILE, 128] f32 (spike counts, col 0)
    rate7_ref,     # [R_TILE, 128] f32
    # scratch:
    w6_buf,        # [2, K_CHUNK, H] bf16
    acc_ref,       # [R_TILE, H] f32
    v6_ref, i6_ref, v7_ref, i7_ref,   # [R_TILE, H] f32
    vc_ref, ic_ref,                   # [R_TILE, C_pad] f32
    vb_ref, ib_ref,                   # [R_TILE, B_pad] f32
    s6_ref,                           # [R_TILE, H] bf16
    dma_sems,                         # DMA semaphores [2]
    *,
    num_steps: int,
    k_total: int,
    dt: float,
):
    n_chunks = k_total // K_CHUNK

    for ref in (v6_ref, i6_ref, v7_ref, i7_ref, vc_ref, ic_ref, vb_ref, ib_ref):
        ref[:] = jnp.zeros_like(ref)
    rate6_ref[:] = jnp.zeros_like(rate6_ref)
    rate7_ref[:] = jnp.zeros_like(rate7_ref)

    tau_mem = dt * snnf.LIF_PARAMS.tau_mem_inv   # 0.1
    tau_syn = dt * snnf.LIF_PARAMS.tau_syn_inv   # 0.2
    v_th = snnf.LIF_PARAMS.v_th                  # 0.1

    def w6_dma(slot, chunk):
        return pltpu.make_async_copy(
            w6_hbm.at[pl.ds(pl.multiple_of(chunk * K_CHUNK, 128), K_CHUNK), :],
            w6_buf.at[slot],
            dma_sems.at[slot],
        )

    def lif_step(v_ref, i_ref, cur):
        v_dec = v_ref[:] + tau_mem * (i_ref[:] - v_ref[:])
        i_dec = i_ref[:] - tau_syn * i_ref[:]
        z = (v_dec > v_th).astype(jnp.float32)
        v_ref[:] = (1.0 - z) * v_dec
        i_ref[:] = i_dec + cur
        return z

    def li_step(v_ref, i_ref, cur):
        i_jump = i_ref[:] + cur
        v_ref[:] = v_ref[:] + tau_mem * (i_jump - v_ref[:])
        i_ref[:] = i_jump - tau_syn * i_jump

    def step_body(t, _):
        # fc6 = z_t @ w6, K-chunked with double-buffered w6 DMA.
        w6_dma(0, 0).start()

        def chunk_body(kc, _):
            slot = kc % 2
            nxt = (kc + 1) % 2

            @pl.when(kc + 1 < n_chunks)
            def _():
                w6_dma(nxt, kc + 1).start()

            w6_dma(slot, kc).wait()
            # Mosaic vectors support i32, not i8 — widen before the mod.
            start = pl.multiple_of(kc * K_CHUNK, 128)
            per = periods_ref[:, pl.ds(start, K_CHUNK)].astype(jnp.int32)
            z = (jnp.mod(t + 1, per) == 0).astype(jnp.bfloat16)
            partial = jnp.dot(z, w6_buf[slot],
                              preferred_element_type=jnp.float32)

            @pl.when(kc == 0)
            def _():
                acc_ref[:] = partial

            @pl.when(kc > 0)
            def _():
                acc_ref[:] = acc_ref[:] + partial

            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        s6 = lif_step(v6_ref, i6_ref, acc_ref[:])
        rate6_ref[:, 0] += jnp.sum(s6, axis=1)
        s6_ref[:] = s6.astype(jnp.bfloat16)

        cur7 = jnp.dot(s6_ref[:], w7_ref[:], preferred_element_type=jnp.float32)
        s7 = lif_step(v7_ref, i7_ref, cur7)
        rate7_ref[:, 0] += jnp.sum(s7, axis=1)
        s7b = s7.astype(jnp.bfloat16)

        li_step(vc_ref, ic_ref,
                jnp.dot(s7b, wc_ref[:], preferred_element_type=jnp.float32))
        li_step(vb_ref, ib_ref,
                jnp.dot(s7b, wb_ref[:], preferred_element_type=jnp.float32))
        return ()

    jax.lax.fori_loop(0, num_steps, step_body, ())

    cls_out_ref[:] = vc_ref[:]
    reg_out_ref[:] = vb_ref[:]


@functools.partial(jax.jit, static_argnames=("num_steps",))
def fastrcnn_snn_pallas(
    x: jnp.ndarray,
    w6: jnp.ndarray,
    w7: jnp.ndarray,
    wc: jnp.ndarray,
    wb: jnp.ndarray,
    num_steps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused spiking box head.

    x:  [R, K] flattened RoI features (any float dtype)
    w6: [K, H]; w7: [H, H]; wc: [H, C]; wb: [H, B]
    Returns (cls_logits [R, C] f32, bbox_deltas [R, B] f32,
             fc6_rate [R], fc7_rate [R]) — rates are mean spikes/neuron/step.
    """
    r, k = x.shape
    h = w6.shape[1]
    c = wc.shape[1]
    b = wb.shape[1]
    assert k % K_CHUNK == 0, (k, K_CHUNK)

    r_pad = _round_up(r, R_TILE)
    c_pad = _round_up(c, 128)
    b_pad = _round_up(b, 128)

    periods = snnf.encoder_periods(x).astype(jnp.int16)
    periods = jnp.pad(periods, ((0, r_pad - r), (0, 0)), constant_values=255)

    w6b = w6.astype(jnp.bfloat16)
    w7b = w7.astype(jnp.bfloat16)
    wcb = jnp.pad(wc.astype(jnp.bfloat16), ((0, 0), (0, c_pad - c)))
    wbb = jnp.pad(wb.astype(jnp.bfloat16), ((0, 0), (0, b_pad - b)))

    grid = (r_pad // R_TILE,)
    kernel = functools.partial(
        _head_kernel, num_steps=num_steps, k_total=k, dt=snnf.DT
    )

    cls_o, reg_o, rate6, rate7 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # w6 stays off-chip
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, b_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_TILE, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K_CHUNK, h), jnp.bfloat16),
            pltpu.VMEM((R_TILE, h), jnp.float32),
            pltpu.VMEM((R_TILE, h), jnp.float32),
            pltpu.VMEM((R_TILE, h), jnp.float32),
            pltpu.VMEM((R_TILE, h), jnp.float32),
            pltpu.VMEM((R_TILE, h), jnp.float32),
            pltpu.VMEM((R_TILE, c_pad), jnp.float32),
            pltpu.VMEM((R_TILE, c_pad), jnp.float32),
            pltpu.VMEM((R_TILE, b_pad), jnp.float32),
            pltpu.VMEM((R_TILE, b_pad), jnp.float32),
            pltpu.VMEM((R_TILE, h), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(periods, w6b, w7b, wcb, wbb)

    fc6_rate = rate6[:r, 0] / (num_steps * h)
    fc7_rate = rate7[:r, 0] / (num_steps * h)
    return cls_o[:r, :c], reg_o[:r, :b], fc6_rate, fc7_rate
