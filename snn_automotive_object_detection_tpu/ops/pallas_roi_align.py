"""Patch-based Pallas RoIAlign for TPU inference.

The XLA gather formulation (ops/roi_align.py) moves one [2, 2C] row per
bilinear sample point — 392K random gathers per batch at the flagship
operating point, ~13.5 ms on v5e, bounded by gather issue rate rather than
bytes. This kernel exploits two structural facts torchvision's semantics
give us (reference model.py:114-118, torchvision MultiScaleRoIAlign):

  1. All 14x14 sample points of one RoI live in a small contiguous window
     of its assigned FPN level — so fetch the whole window with ONE strided
     DMA (static [PH, PW] patch) instead of 196 point gathers.
  2. The sample grid is REGULAR (affine in the bin index), and the bin
     average factors: sum_{i,j in bin} Wy[i,p]*Wx[j,x] =
     (sum_i Wy[i,p]) * (sum_j Wx[j,x]). The entire align for one RoI —
     bilinear interpolation, torchvision border rules, validity masking AND
     the sampling_ratio^2 average — collapses into ONE small matmul
     [64, PH*PW] @ [PH*PW, C] with a weight matrix built from two rank-1
     factors in VMEM.

Levels are stacked into one zero-padded common-stride buffer
[N, sum_l H_l (+PH), STRIDE_W, C] so the per-RoI DMA needs no per-level
switch: row0 = level_row_offset + y0. Reading past a level's true width or
height only ever touches zero padding, and those positions always carry
zero weight (torchvision's border collapse makes lx/ly exactly 0 there).

RoIs whose sample span exceeds the static patch (pathological aspect
ratios; impossible for boxes the FPN level mapper sizes normally) are
handled EXACTLY: the caller wraps this kernel in a lax.cond that falls back
to the gather path for the whole batch when any RoI does not fit.

bf16 features use a bf16x2 split of the f32 weight matrix (hi + lo matmuls,
f32 accumulation) so interpolation weights keep ~f32 precision; f32
features use a single f32 matmul (bit-comparable to the gather path).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_automotive_object_detection_tpu.ops.roi_align import (
    assign_fpn_levels,
    infer_scales,
    multiscale_roi_align,
)

def _round_up_int(x: int, m: int) -> int:
    return (x + m - 1) // m * m


PH = 40   # patch rows; covers roi_hf + 2 up to 40 feature rows
PW = 56   # patch cols (8-aligned DMA offset costs up to 7 extra cols)
OS = 7    # output size
SR = 2    # sampling ratio
NS = OS * SR  # 14 samples per axis


def _sample_positions(dtype):
    i = jnp.arange(NS, dtype=dtype)
    return jnp.floor(i / SR) + ((i - SR * jnp.floor(i / SR)) + 0.5) / SR


def _prep(boxes_flat, levels_flat, lvl_h, lvl_w, lvl_scale, lvl_rowoff,
          stride_w):
    """Per-RoI patch geometry + fit check. All inputs/outputs flat [P]."""
    scale = lvl_scale[levels_flat]
    hh = lvl_h[levels_flat]
    ww = lvl_w[levels_flat]

    x1 = boxes_flat[:, 0] * scale
    y1 = boxes_flat[:, 1] * scale
    x2 = boxes_flat[:, 2] * scale
    y2 = boxes_flat[:, 3] * scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / OS
    bin_h = jnp.maximum(y2 - y1, 1.0) / OS

    pos = _sample_positions(boxes_flat.dtype)  # [NS]

    def lows(start, bins, size):
        s = start[:, None] + pos[None, :] * bins[:, None]   # [P, NS]
        sc = jnp.clip(s, 0.0)
        low = jnp.minimum(sc.astype(jnp.int32), size[:, None] - 1)
        sc = jnp.where(low >= size[:, None] - 1, low.astype(sc.dtype), sc)
        frac = sc - low.astype(sc.dtype)
        need = low + (frac > 0)                              # index of hi tap
        return low.min(1), jnp.maximum(low, need).max(1)

    y_min, y_need = lows(y1, bin_h, hh)
    x_min, x_need = lows(x1, bin_w, ww)

    y0 = jnp.clip(y_min, 0, jnp.maximum(hh - PH, 0))
    # The clip bound must itself be 8-aligned or the kernel's
    # pl.multiple_of(x0, 8) DMA promise is violated for widths where
    # stride_w - PW is not a multiple of 8.
    x0 = jnp.clip((x_min // 8) * 8, 0, (stride_w - PW) // 8 * 8)
    fits = (y_need - y0 <= PH - 1) & (x_need - x0 <= PW - 1)

    row0 = lvl_rowoff[levels_flat] + y0
    return {
        "row0": row0.astype(jnp.int32),
        "x0": x0.astype(jnp.int32),
        "y0": y0.astype(jnp.int32),
        "y1s": y1.astype(jnp.float32),
        "x1s": x1.astype(jnp.float32),
        "bin_h": bin_h.astype(jnp.float32),
        "bin_w": bin_w.astype(jnp.float32),
        "hf": hh.astype(jnp.float32),
        "wf": ww.astype(jnp.float32),
        "fits_all": fits.all(),
    }


def _axis_bin_weights(start, binsz, size_f, origin, plen):
    """[8, plen] f32: per-bin (pair-summed) interpolation weights along one
    axis, reproducing ops/roi_align.py:_bilinear_gather exactly."""
    # Mosaic iota must be integer-typed; widen to f32 after.
    i = jax.lax.broadcasted_iota(jnp.int32, (16, plen), 0).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (16, plen), 1)
    whole = jnp.floor(i / SR)
    s = start + (whole + ((i - SR * whole) + 0.5) / SR) * binsz
    valid = (s >= -1.0) & (s <= size_f) & (i < NS)
    sc = jnp.maximum(s, 0.0)
    size_i = size_f.astype(jnp.int32)
    low = jnp.minimum(sc.astype(jnp.int32), size_i - 1)
    sc = jnp.where(low >= size_i - 1, low.astype(jnp.float32), sc)
    frac = sc - low.astype(jnp.float32)
    v = valid.astype(jnp.float32)
    rel = low - origin
    wgt = (jnp.where(p == rel, 1.0 - frac, 0.0)
           + jnp.where(p == rel + 1, frac, 0.0)) * v
    return wgt.reshape(8, 2, plen).sum(1)  # pair-sum -> per-bin


def _roi_kernel(
    row0_ref, x0_ref, y0_ref, y1s_ref, x1s_ref, binh_ref, binw_ref,
    hf_ref, wf_ref, img_ref,
    stacked_hbm,           # [N, RT, STRIDE_W, C] (ANY — DMA'd manually)
    ry_ref,                # [64, 8]  f32 one-hot b -> b // 8
    rx_ref,                # [64, 8]  f32 one-hot b -> b % 8
    ey_ref,                # [PH, PH*PW] f32 0/1: k // PW == p
    ex_ref,                # [PW, PH*PW] f32 0/1: k %  PW == x
    out_ref,               # [1, 128, C] f32 (two RoIs' 64-bin rows)
    patch_buf,             # [2, 2, PH, PW, C] (pipeline slot, roi-in-pair)
    sems,                  # DMA sems [2, 2]
    *,
    n_pairs: int,
    feat_bf16: bool,
):
    # Two RoIs per grid step: the kernel is per-step-overhead-bound (~1.8 us
    # above the DMA bandwidth floor), so pairing amortizes it.
    q = pl.program_id(0)

    def start_dma(slot, j, idx):
        return pltpu.make_async_copy(
            stacked_hbm.at[
                img_ref[idx],
                pl.ds(row0_ref[idx], PH),
                pl.ds(pl.multiple_of(x0_ref[idx], 8), PW),
                :,
            ],
            patch_buf.at[slot, j],
            sems.at[slot, j],
        )

    slot = jax.lax.rem(q, 2)
    nxt = jax.lax.rem(q + 1, 2)

    @pl.when(q == 0)
    def _():
        start_dma(0, 0, 0).start()
        start_dma(0, 1, 1).start()

    @pl.when(q + 1 < n_pairs)
    def _():
        start_dma(nxt, 0, 2 * (q + 1)).start()
        start_dma(nxt, 1, 2 * (q + 1) + 1).start()

    f32 = jnp.float32
    for j in (0, 1):
        r = 2 * q + j
        by = _axis_bin_weights(y1s_ref[r], binh_ref[r], hf_ref[r],
                               y0_ref[r], PH)
        bx = _axis_bin_weights(x1s_ref[r], binw_ref[r], wf_ref[r],
                               x0_ref[r], PW)
        # Combined [64, PH*PW] weight matrix WITHOUT lane-merging reshapes
        # (unsupported by Mosaic): expand the two rank-1 factors onto the
        # flat k = p*PW + x axis via constant 0/1 matmuls, then multiply.
        # The 0.25 is the (sampling_ratio^2) sample average.
        wy_flat = jnp.dot(jnp.dot(ry_ref[:], by, preferred_element_type=f32),
                          ey_ref[:], preferred_element_type=f32)
        wx_flat = jnp.dot(jnp.dot(rx_ref[:], bx, preferred_element_type=f32),
                          ex_ref[:], preferred_element_type=f32)
        wc = wy_flat * wx_flat * 0.25

        start_dma(slot, j, r).wait()
        patch = patch_buf[slot, j].reshape(PH * PW, -1)

        if feat_bf16:
            hi = wc.astype(jnp.bfloat16)
            lo = (wc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out = jnp.dot(hi, patch, preferred_element_type=jnp.float32)
            out = out + jnp.dot(lo, patch, preferred_element_type=jnp.float32)
        else:
            out = jnp.dot(wc, patch.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        out_ref[0, 64 * j:64 * (j + 1), :] = out


def _stack_levels(features, stride_w):
    """[N, sum H_l + PH, stride_w, C] zero-padded common-stride buffer.
    The last level must come last so over-reads land in the zero tail."""
    n, _, _, c = features[0].shape
    parts = [
        jnp.pad(f, ((0, 0), (0, 0), (0, stride_w - f.shape[2]), (0, 0)))
        for f in features
    ]
    parts.append(jnp.zeros((n, PH, stride_w, c), features[0].dtype))
    return jnp.concatenate(parts, axis=1)


def multiscale_roi_align_pallas(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    canonical_scale: float = 224.0,
    canonical_level: float = 4.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in multiscale_roi_align (output_size=7, sampling_ratio=2) with
    exact semantics: Pallas patch kernel when every RoI's sample window fits
    the static patch, whole-batch XLA-gather fallback otherwise."""
    num_levels = len(features)
    n, r, _ = boxes.shape
    c = features[0].shape[-1]
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    scales = infer_scales(shapes, image_size)
    k_min = int(-math.log2(scales[0]))
    # Common stride >= PW so the 8-aligned patch window always fits it.
    stride_w = max(max(w for _, w in shapes), PW)

    levels = assign_fpn_levels(
        boxes, num_levels, canonical_scale, canonical_level, k_min,
        k_max=int(-math.log2(scales[-1])),
    ).reshape(-1)

    offs = [0]
    for hh, _ in shapes[:-1]:
        offs.append(offs[-1] + hh)
    lvl_h = jnp.asarray([hh for hh, _ in shapes], jnp.int32)
    lvl_w = jnp.asarray([ww for _, ww in shapes], jnp.int32)
    lvl_rowoff = jnp.asarray(offs, jnp.int32)
    lvl_scale = jnp.asarray(scales, boxes.dtype)

    boxes_flat = boxes.reshape(-1, 4)
    g = _prep(boxes_flat, levels, lvl_h, lvl_w, lvl_scale, lvl_rowoff,
              stride_w)
    img_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), r)

    stacked = _stack_levels(features, stride_w)
    p_total = n * r
    feat_bf16 = stacked.dtype == jnp.bfloat16

    # Constant expansion matrices for the in-kernel weight build.
    b_idx = np.arange(64)
    ry = (b_idx[:, None] // 8 == np.arange(8)[None]).astype(np.float32)
    rx = (b_idx[:, None] % 8 == np.arange(8)[None]).astype(np.float32)
    k_idx = np.arange(PH * PW)
    ey = (k_idx[None, :] // PW == np.arange(PH)[:, None]).astype(np.float32)
    ex = (k_idx[None, :] % PW == np.arange(PW)[:, None]).astype(np.float32)

    # Two RoIs per grid step (per-step overhead amortization): pad the
    # per-RoI scalar arrays to an even count with index-0 dummies (valid
    # DMA coordinates; the dummy output row is sliced away).
    p_pad = _round_up_int(p_total, 2)
    n_pairs = p_pad // 2

    def pad_scalars(v):
        return jnp.pad(v, (0, p_pad - p_total))

    def pallas_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=10,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((64, 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PH, PH * PW), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PW, PH * PW), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128, c), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 2, PH, PW, c), stacked.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_roi_kernel, n_pairs=n_pairs,
                              feat_bf16=feat_bf16),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pairs, 128, c), jnp.float32),
            interpret=interpret,
        )(
            pad_scalars(g["row0"]), pad_scalars(g["x0"]),
            pad_scalars(g["y0"]), pad_scalars(g["y1s"]),
            pad_scalars(g["x1s"]), pad_scalars(g["bin_h"]),
            pad_scalars(g["bin_w"]), pad_scalars(g["hf"]),
            pad_scalars(g["wf"]), pad_scalars(img_ids),
            stacked, jnp.asarray(ry), jnp.asarray(rx),
            jnp.asarray(ey), jnp.asarray(ex),
        )
        out = out.reshape(p_pad, 64, c)[:p_total]
        return out.reshape(n, r, 8, 8, c)[:, :, :OS, :OS]

    def fallback(_):
        return multiscale_roi_align(
            features, boxes, image_size, OS, SR,
            canonical_scale, canonical_level,
        ).astype(jnp.float32)

    return jax.lax.cond(g["fits_all"], pallas_path, fallback, None)
