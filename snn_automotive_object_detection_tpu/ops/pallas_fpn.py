"""Fused Pallas TPU kernel for the FPN (lateral + top-down merge + outer 3x3).

The XLA FPN (models/resnet_fpn.py:239-257 — torchvision FeaturePyramidNetwork
semantics, reference faster_rcnn.py:693-700 builds it via _resnet_fpn_extractor)
round-trips every level through HBM several times: lateral 1x1 GEMM out,
nearest-upsample materialization, merge add, then the 3x3 outer conv reads the
merged map again. Measured round 3: ~2.97 ms in-context at batch 2 vs a ~1.7 ms
roofline (CLAUDE.md backbone profile), with the P2 (192x384x256) chain
dominating the traffic.

This kernel computes ONE level end-to-end per launch:

    P_l = conv3x3(merged_l) + b_out
    merged_l = (C_l @ W_lat + b_lat) + upsample2x_nearest(merged_{l+1})

with each [N, tile_h, W, 256] output tile touching HBM exactly once per
operand: the C_l halo window and the HALF-height upsample rows are DMA'd in,
everything else stays in VMEM.

  * Layout: the same row-flattened (y, x) -> y*W_pad + x scheme as the RPN
    kernel (snn/pallas_rpn.py) — every 3x3 tap is a contiguous
    sublane-shifted slice, so the conv is 9 shifted [M, 256] @ [256, 256]
    matmuls accumulated in f32.
  * Lateral GEMM + bias + merge run per window row ([W_pad, C_in] @
    [C_in, 256] matmuls) with the EXACT bf16 rounding sequence of the XLA
    path: f32 MXU accumulation -> bf16 round -> +bias (bf16) -> +upsample
    (bf16) — so merged maps agree with resnet_fpn.py at the usual 1-ulp /
    reduction-order class.
  * Nearest upsample: the next level's merged map is W-repeated XLA-side
    (cheap: quarter-size tensor) and H-duplicated IN-KERNEL by static row
    indexing — tile row j (even row0) reads upsample row (j+1)//2 of the
    DMA'd half-window, so no full-size upsample tensor ever exists in HBM.
  * Border semantics: merged values outside the image are masked to ZERO
    (torch zero-pads the conv input); this also kills the b_lat bias that a
    zero-padded C_l would otherwise leak into halo rows/cols.

Top-down sequencing stays XLA-side (P5 -> P2, each launch consuming the
previous launch's merged output), and LastLevelMaxPool is a pure stride-2
subsample of P5 (resnet_fpn.py:256).

bf16 + TPU inference only, like the other kernels: --fp32 parity runs keep
the XLA FPN.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BASE = 16
_VMEM_BUDGET = 12 * 1024 * 1024

_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_bytes(th: int, w_pad: int, cin: int, has_up: bool,
                store_merged: bool) -> int:
    """Scratch + output-window VMEM for one tile (bf16 planes)."""
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 2, 16)
    m = th * w_pad
    xwin = (th + 2) * w_pad * cin * 2
    uwin = (th // 2 + 2) * w_pad * 256 * 2 if has_up else 0
    mrg = s_alloc * 256 * 2
    acc = m * 256 * 4
    row_tmp = w_pad * 256 * 4                       # per-row f32 GEMM out
    outs = 2 * m * 256 * 2 * (2 if store_merged else 1)
    weights = (9 * 256 * 256 + cin * 256) * 2
    return xwin + uwin + mrg + acc + row_tmp + outs + weights


def _choose_tile_h(h: int, w_pad: int, cin: int, has_up: bool,
                   store_merged: bool) -> int:
    cap = _round_up(h, 2)
    for th in (32, 16, 8, 4, 2):      # even -> row0 even (u-row indexing)
        if th <= cap and _vmem_bytes(th, w_pad, cin, has_up,
                                     store_merged) <= _VMEM_BUDGET:
            return th
    return 2


def _fpn_level_kernel(
    x_hbm,      # [N, HT, W_pad, Cin] bf16 — zero-padded C_l (ANY)
    u_hbm,      # [N, H2T, W_pad, 256] bf16 — W-repeated merged_{l+1} (ANY)
    wlat_ref,   # [Cin, 256] bf16
    blat_ref,   # [1, 256]  bf16
    w9_ref,     # [9, 256, 256] bf16 — outer 3x3 taps (dy-major)
    bout_ref,   # [1, 256]  bf16
    *rest,      # outP [1, M, 256], [outM [1, M, 256]], scratches
    n_th: int,
    tile_h: int,
    m_rows: int,
    w_pad: int,
    h_img: int,
    w_img: int,
    has_up: bool,
    store_merged: bool,
):
    if store_merged:
        outp_ref, outm_ref, *rest = rest
    else:
        outp_ref, *rest = rest
        outm_ref = None
    if has_up:
        xwin_ref, uwin_ref, mrg_ref, acc_ref, xsem, usem = rest
    else:
        xwin_ref, mrg_ref, acc_ref, xsem = rest
        uwin_ref = None

    r = pl.program_id(0)
    img = r // n_th
    row0 = (r % n_th) * tile_h           # EVEN by construction

    xdma = pltpu.make_async_copy(
        x_hbm.at[img, pl.ds(row0, tile_h + 2), :, :], xwin_ref, xsem
    )
    xdma.start()
    if has_up:
        # Window row j (global padded row g = row0 + j) merges upsample row
        # (g - 1)//2 + 1 of the padded half-height map; with row0 even that
        # is u_start + (j + 1)//2 for u_start = row0 // 2.
        udma = pltpu.make_async_copy(
            u_hbm.at[img, pl.ds(row0 // 2, tile_h // 2 + 2), :, :],
            uwin_ref, usem,
        )
        udma.start()

    # Zero the flat merged buffer: tap wrap-around reads (up to one row
    # beyond the halo window and the _BASE prefix) must contribute 0.
    mrg_ref[:] = jnp.zeros_like(mrg_ref)

    xdma.wait()
    if has_up:
        udma.wait()

    # Border mask for one window row: cols 1..W are real, everything else
    # (left zero col, right pad) is outside the image. Row validity is
    # folded in per row below. (i32 iota: Mosaic has no f32 iota.)
    col = jax.lax.broadcasted_iota(jnp.int32, (w_pad, 256), 0)
    col_ok = (col >= 1) & (col <= w_img)

    for j in range(tile_h + 2):
        # lateral GEMM + bias in the XLA path's rounding order:
        # f32 accumulate -> bf16 -> + b (bf16) -> + upsample (bf16)
        lat = jnp.dot(xwin_ref[j], wlat_ref[:],
                      preferred_element_type=jnp.float32)
        mrow = lat.astype(jnp.bfloat16) + blat_ref[0]
        if has_up:
            mrow = mrow + uwin_ref[(j + 1) // 2]
        y = row0 + j - 1                       # image row of this window row
        ok = col_ok & (y >= 0) & (y < h_img)
        mrow = jnp.where(ok, mrow, jnp.zeros_like(mrow))
        mrg_ref[_BASE + j * w_pad:_BASE + (j + 1) * w_pad, :] = mrow

    # Outer 3x3 as 9 shifted matmuls (see snn/pallas_rpn.py).
    for k, (dy, dx) in enumerate(_TAPS):
        start = _BASE + (1 + dy) * w_pad + dx
        part = jnp.dot(
            mrg_ref[start:start + m_rows, :],
            w9_ref[k],
            preferred_element_type=jnp.float32,
        )
        if k == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    outp_ref[0] = (acc_ref[:].astype(jnp.bfloat16)
                   + bout_ref[0][None, :])
    if store_merged:
        outm_ref[0] = mrg_ref[_BASE + w_pad:_BASE + w_pad + m_rows, :]


def fpn_level_pallas(
    c_feat: jnp.ndarray,
    merged_next: Optional[jnp.ndarray],
    wlat: jnp.ndarray,
    blat: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    store_merged: bool,
    interpret: Optional[bool] = None,
):
    """One FPN level: returns (P_l [N, H, W, 256], merged_l or None).

    c_feat: [N, H, W, Cin] backbone stage output (bf16).
    merged_next: [N, ceil(H/2), ceil(W/2), 256] merged map of the level
        above (None for the top level P5).
    wlat/blat: 1x1 lateral; wout/bout: 3x3 outer (HWIO [3, 3, 256, 256]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, cin = c_feat.shape
    w_pad = _round_up(w + 2, 16)
    has_up = merged_next is not None
    th = _choose_tile_h(h, w_pad, cin, has_up, store_merged)
    n_th = -(-h // th)
    m_rows = th * w_pad
    s_alloc = _round_up(_BASE + (th + 2) * w_pad + w_pad + 2, 16)

    x_pad = jnp.pad(
        c_feat.astype(jnp.bfloat16),
        ((0, 0), (1, n_th * th - h + 1), (1, w_pad - w - 1), (0, 0)),
    )
    if has_up:
        # W-only nearest repeat of the quarter-size merged map; the kernel
        # duplicates rows. Padded like x: zero top halo row, zero left col.
        uw = jnp.repeat(merged_next.astype(jnp.bfloat16), 2, axis=2)[:, :, :w]
        h2t = n_th * (th // 2) + 2
        uw = jnp.pad(
            uw,
            ((0, 0), (1, h2t - uw.shape[1] - 1), (1, w_pad - w - 1), (0, 0)),
        )
    else:
        uw = jnp.zeros((n, 8, w_pad, 256), jnp.bfloat16)

    kernel = functools.partial(
        _fpn_level_kernel, n_th=n_th, tile_h=th, m_rows=m_rows, w_pad=w_pad,
        h_img=h, w_img=w, has_up=has_up, store_merged=store_merged,
    )
    out_specs = [pl.BlockSpec((1, m_rows, 256), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n * n_th, m_rows, 256), jnp.bfloat16)]
    if store_merged:
        out_specs.append(pl.BlockSpec((1, m_rows, 256), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n * n_th, m_rows, 256), jnp.bfloat16))
    scratch = [pltpu.VMEM((th + 2, w_pad, cin), jnp.bfloat16)]
    if has_up:
        scratch.append(pltpu.VMEM((th // 2 + 2, w_pad, 256), jnp.bfloat16))
    scratch += [
        pltpu.VMEM((s_alloc, 256), jnp.bfloat16),
        pltpu.VMEM((m_rows, 256), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if has_up:
        scratch.append(pltpu.SemaphoreType.DMA(()))

    outs = pl.pallas_call(
        kernel,
        grid=(n * n_th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cin, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 256, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        x_pad, uw,
        wlat.reshape(cin, 256).astype(jnp.bfloat16),
        blat.reshape(1, 256).astype(jnp.bfloat16),
        wout.reshape(9, 256, 256).astype(jnp.bfloat16),
        bout.reshape(1, 256).astype(jnp.bfloat16),
    )

    def unflatten(o):
        o = o.reshape(n, n_th, th, w_pad, 256)[:, :, :, 1:w + 1, :]
        return o.reshape(n, n_th * th, w, 256)[:, :h]

    p_out = unflatten(outs[0])
    merged = unflatten(outs[1]) if store_merged else None
    return p_out, merged


def fpn_pallas_apply(cs: List[jnp.ndarray], fpn_params) -> List[jnp.ndarray]:
    """Full FPN over the 4 backbone stages (resnet_fpn.py:239-257 semantics):
    returns [P2, P3, P4, P5, pool]."""
    inner = fpn_params["inner"]
    layer = fpn_params["layer"]
    merged = None
    outs = [None] * 4
    for i in (3, 2, 1, 0):
        outs[i], merged = fpn_level_pallas(
            cs[i], merged,
            inner[i]["w"], inner[i]["b"], layer[i]["w"], layer[i]["b"],
            store_merged=(i > 0),
        )
    outs.append(outs[3][:, ::2, ::2, :])   # LastLevelMaxPool: 1x1 stride 2
    return outs
