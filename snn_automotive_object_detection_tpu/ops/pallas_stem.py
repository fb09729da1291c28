"""Fused Pallas ResNet stem: normalize + 7x7/2 conv + BN + ReLU + maxpool3x3/2.

Why: XLA is 10-25x over roofline on every op in this stage (measured on v5e,
batch 2 at 768x1536: f32->bf16 cast alone 1.77 ms, 7x7/2 conv 2.57 ms,
maxpool 1.91 ms — the C=3 input forces XLA to pad channels to 128 lanes and
stream ~40x the real bytes). The whole region is ~3.2-5 ms of a 47 ms step
for ~11 GFLOP of work. Reference stage: the torchvision ResNet stem the
reference's frozen backbone runs first (backbone_utils.py resnet_fpn
construction; generalized_rcnn.py:93-94 runs it under no_grad).

Design (TPU-first, not a translation):

  * The HOST (or on-device generator) provides the image in rows-outermost
    planar space-to-depth layout ``[N, H/2 + 4, 16, W/2]`` f32: row r holds
    s2d row rh = r - 3 with plane index c = subH*6 + subW*3 + cin (planes
    12-15 zero), and the 3 top / 1 bottom pad rows hold the per-channel
    raw MEAN (see :func:`planarize_image`). Rows-outermost makes each
    tile's input ONE unconstrained DMA (rows are an untiled dim; Mosaic
    requires 8-aligned sublane and 128-aligned lane slicing for DMA), and
    the mean padding makes out-of-image taps contribute exactly the XLA
    path's normalized-space zero (below).
  * In the s2d domain the 7x7 stride-2 conv becomes a 4x4 stride-1 conv
    over the planes: orig row offset d in [-3, 3] maps to
    (drh = floor(d/2), subH = d mod 2), same for columns. One row-tile's
    conv is 4 accumulating [64, 64] @ [64, (2tp+1)*Ws] MXU matmuls (one
    per drh), each operand built by 4*(2tp+1) shifted [16, Ws] block
    stores (unaligned lane offsets are legal for loads on v5e Mosaic).
  * Input normalization ((x - mean)/std, models/transform.py) and the
    frozen-BN affine are folded into the conv weights and a bias. The
    XLA path zero-pads the conv in NORMALIZED space, so out-of-image taps
    must contribute exactly 0: raw-MEAN border pixels make the folded tap
    w'*mean cancel the bias share -w'*mean identically.
  * ReLU + 3x3/2 maxpool run on the conv tile in VMEM: 3-row max, then
    the W-direction window+stride-2 decimation as ONE exact 0/1 selection
    matmul [64, Wc] @ [Wc, 3*Wp] (columns are the -1/0/+1 taps of each
    pool column; single nonzero per column — no accumulation, exact in
    bf16) followed by a 3-block max, then an f32 vector transpose to emit
    NHWC [tp, Wp, 64] blocks. ReLU guarantees the "missing tap" zero
    columns at the borders can never win the max.

Mosaic findings baked in (v5e): DMA slices must be 8-aligned in sublanes /
128-aligned in lanes (untiled leading dims are unconstrained — hence the
rows-outermost layout); unaligned lane offsets on vector LOADS are fine;
``dot_general`` contracting lhs dim 0 compiles but MISCOMPILES (wrong
values) — use jnp.transpose (correct, verified) instead.

Numerics: conv accumulates in f32 and rounds to the state dtype once
(the XLA path rounds at normalize-cast, conv-out, and affine separately),
so bf16 outputs differ from the XLA bf16 stem at the last-ulp level — the
same class as the RPN/RoIAlign kernels; --fp32 parity runs keep the XLA
stem (models/detector.py gates). The float32 variant (state_dtype=f32)
matches the XLA f32 stem to reduction-order tolerance.

Forward-only is fine even for training: the backbone is always frozen
(reference generalized_rcnn.py:93-94; detector.py stop_gradients features).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MARG = 128   # lane margin (only +-2 used; 128 keeps margin stores aligned)
_NEG = -1e30  # very-negative pool padding (finite in bf16)
_NP = 16      # planes (12 real + 4 zero)
_TOP = 3      # mean pad rows above s2d row 0 (conv row -1 needs rh -3)
_BOT = 1      # mean pad rows below (last conv row needs rh = Hs)

_VMEM_BUDGET = 12 * 1024 * 1024


def fold_stem_weights(w, bn_scale, bn_bias, image_mean, image_std):
    """Fold normalize + frozen-BN affine into s2d conv operands.

    w: [7, 7, 3, 64] HWIO stem weights. Returns (w256 [256, 64] f32,
    bias [64] f32, mean3 [3] f32) with k = ((drh+2)*4 + (sx+2))*16 + c,
    c = subH*6 + subW*3 + cin (d = 2*drh + subH, e = 2*sx + subW).
    """
    mean = jnp.asarray(image_mean, jnp.float32)
    std = jnp.asarray(image_std, jnp.float32)
    wf = w.astype(jnp.float32) * (1.0 / std)[None, None, :, None]
    wf = wf * bn_scale.astype(jnp.float32)[None, None, None, :]
    bias = bn_bias.astype(jnp.float32) - jnp.einsum("hwco,c->o", wf, mean)
    w256 = jnp.zeros((4, 4, _NP, 64), jnp.float32)
    for dy in range(7):
        d = dy - 3
        drh, sub_h = d // 2, d - 2 * (d // 2)
        for dx in range(7):
            e = dx - 3
            sx, sub_w = e // 2, e - 2 * (e // 2)
            c = sub_h * 6 + sub_w * 3
            w256 = w256.at[drh + 2, sx + 2, c:c + 3, :].set(wf[dy, dx])
    return w256.reshape(16 * _NP, 64), bias, mean


def mean_planes(image_mean, dtype=jnp.float32):
    """[16] per-plane raw mean (plane % 3 channel pattern; pad planes 0)."""
    mean = jnp.asarray(image_mean, dtype)
    return jnp.concatenate(
        [jnp.tile(mean, 4), jnp.zeros(4, dtype)]
    )


def planarize_image(x, image_mean):
    """[..., H, W, 3] -> [..., H/2 + 4, 16, W/2] rows-outermost planar s2d.

    Row r holds s2d row r - _TOP; plane = subH*6 + subW*3 + cin (planes
    12-15 zero); the pad rows hold the per-channel raw mean. The host
    loader emits this layout directly (numpy); this is the XLA
    fallback/reference implementation.
    """
    *lead, h, w, _ = x.shape
    hs, ws = h // 2, w // 2
    y = x.reshape(*lead, hs, 2, ws, 2, 3)
    nl = len(lead)
    # -> [..., hs, subH, subW, cin, ws]
    perm = tuple(range(nl)) + tuple(nl + i for i in (0, 1, 3, 4, 2))
    xp = jnp.transpose(y, perm).reshape(*lead, hs, 12, ws)
    xp = jnp.pad(xp, [(0, 0)] * (nl + 1) + [(0, 4), (0, 0)])
    mrow = jnp.broadcast_to(
        mean_planes(image_mean, x.dtype)[:, None], (_NP, ws)
    )
    mrow = jnp.broadcast_to(mrow, (*lead, 1, _NP, ws))
    top = jnp.concatenate([mrow] * _TOP, axis=nl)
    bot = jnp.concatenate([mrow] * _BOT, axis=nl)
    return jnp.concatenate([top, xp, bot], axis=nl)


def planarize_image_np(x: np.ndarray, image_mean) -> np.ndarray:
    """Host (numpy) planarize_image: [..., H, W, 3] -> [..., H/2+4, 16, W/2].

    The loader calls this per batch so the device never pays the 6D
    transpose (measured 6.4 ms on v5e at 768x1536 batch 2 — slower than
    the whole XLA stem it would replace)."""
    *lead, h, w, _ = x.shape
    hs, ws = h // 2, w // 2
    y = x.reshape(*lead, hs, 2, ws, 2, 3)
    nl = len(lead)
    perm = tuple(range(nl)) + tuple(nl + i for i in (0, 1, 3, 4, 2))
    xp = np.transpose(y, perm).reshape(*lead, hs, 12, ws)
    out = np.zeros((*lead, hs + _TOP + _BOT, _NP, ws), x.dtype)
    out[..., _TOP:_TOP + hs, :12, :] = xp
    mp = np.concatenate(
        [np.tile(np.asarray(image_mean, x.dtype), 4), np.zeros(4, x.dtype)]
    )
    out[..., :_TOP, :, :] = mp[:, None]
    out[..., _TOP + hs:, :, :] = mp[:, None]
    return out


def unplanarize_image(xp):
    """Inverse of planarize_image: [..., Hs+4, 16, Ws] -> [..., 2Hs, 2Ws, 3]."""
    *lead, hp4, _, ws = xp.shape
    hs = hp4 - _TOP - _BOT
    y = xp[..., _TOP:_TOP + hs, :12, :].reshape(*lead, hs, 2, 2, 3, ws)
    nl = len(lead)
    perm = tuple(range(nl)) + tuple(nl + i for i in (0, 1, 4, 2, 3))
    return jnp.transpose(y, perm).reshape(*lead, 2 * hs, 2 * ws, 3)


def _stem_kernel(
    xp_hbm,     # [N, Hs+4, 16, Ws] f32 planar s2d raw image (ANY — DMA)
    w_ref,      # [64, 256] sd folded weights (lane block b = drh index)
    b_ref,      # [64, 128] f32 bias (column 0 used)
    m_ref,      # [16, 128] f32 per-plane raw mean (column 0 used)
    sel_ref,    # [Wc, Wp] sd 0/1 stride-2 decimation [x == 2x'']
    out_ref,    # [1, tp, Wp, 64] sd NHWC pool output block
    xpw_ref,    # [RH, 16, Ws + 2*_MARG] f32 DMA window (+mean margins)
    rhs_ref,    # [64, (2tp+1)*Wc] sd per-drh conv operand; reused as the
                # rounded conv output after the last matmul
    acc_ref,    # [64, (2tp+1)*Wc] f32 conv accumulator
    mrow_ref,   # [64, Wc + 16] f32 pool row scratch (-1e30 margins)
    dma_sem,
    *,
    tp: int,
    n_tiles: int,
    hs: int,
    ws: int,
    interp: bool = False,
):
    sd = rhs_ref.dtype

    def _dot(a, b):
        # interpret mode (CPU) lacks bf16 dot thunks; extending operands
        # to f32 is exact (bf16 products are representable in f32 and the
        # accumulator is f32 either way).
        if interp:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    wc = ws                      # conv out cols == s2d cols
    wp = wc // 2                 # pool out cols
    hc = hs                      # conv out rows == s2d rows
    n_rows = 2 * tp + 1          # conv rows per tile
    rh_win = 2 * tp + 4          # s2d input rows per tile
    t = pl.program_id(0)
    img = t // n_tiles
    y0p = (t % n_tiles) * tp     # first pool row of the tile
    cy0 = 2 * y0p - 1            # first conv row (may be -1)

    # ---- ONE input DMA per tile: rows are an untiled leading dim, so the
    # dynamic start needs no alignment. Source row r = rh + _TOP; the first
    # needed s2d row is cy0 - 2, so start = cy0 - 2 + _TOP = 2*y0p >= 0,
    # and the host's mean pad rows cover both edges.
    cp = pltpu.make_async_copy(
        xp_hbm.at[img, pl.ds(2 * y0p, rh_win), :, :],
        xpw_ref.at[:, :, pl.ds(_MARG, ws)],
        dma_sem,
    )
    cp.start()

    # lane margins: raw mean per plane (border taps cancel the bias fold)
    mcol = m_ref[:, 0:1]
    marg = jnp.broadcast_to(mcol[None, :, :], (rh_win, _NP, _MARG))
    xpw_ref[:, :, 0:_MARG] = marg
    xpw_ref[:, :, ws + _MARG:] = marg

    cp.wait()

    # ---- conv: 4 accumulating [64, 64] @ [64, n_rows*Wc] matmuls, one per
    # drh; operands are 4 sx-shifted [16, Ws] stores per conv row, read
    # from the mean-margined window at lane offset _MARG+sx.
    for drh in range(4):
        for sx in range(4):
            for ly in range(n_rows):
                # s2d row for conv row cy0+ly at this drh: local index
                # (cy0+ly + drh-2) - (cy0-2) = ly + drh.
                rhs_ref[_NP * sx:_NP * (sx + 1),
                        ly * wc:(ly + 1) * wc] = (
                    xpw_ref[ly + drh, :,
                            pl.ds(_MARG + sx - 2, wc)].astype(sd)
                )
        part = _dot(w_ref[:, pl.ds(64 * drh, 64)], rhs_ref[:])
        if drh == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    # round once to sd, bias + ReLU (f32 math on sd-rounded values)
    conv_sd = acc_ref[:].astype(sd)
    biased = (conv_sd.astype(jnp.float32)
              + jnp.broadcast_to(b_ref[:, 0:1], conv_sd.shape))
    rhs_ref[:] = jnp.maximum(biased, 0.0).astype(sd)

    # invalidate out-of-range conv rows for the pool max (tile 0 reads
    # conv row -1; the last tile's window stays in range by construction)
    for ly in range(n_rows):
        @pl.when((cy0 + ly < 0) | (cy0 + ly >= hc))
        def _(ly=ly):
            rhs_ref[:, ly * wc:(ly + 1) * wc] = jnp.full(
                (64, wc), _NEG, sd
            )

    # ---- pool: 3-row max (f32 on sd-rounded values — exact), 3-tap
    # window max via +-1 unaligned lane reads from a -1e30-margined
    # scratch (VPU), then stride-2 decimation as one exact 0/1 matmul
    # and an f32 vector transpose to NHWC.
    for yy in range(tp):
        r0, r1, r2 = 2 * yy, 2 * yy + 1, 2 * yy + 2
        m3 = jnp.maximum(
            jnp.maximum(
                rhs_ref[:, r0 * wc:(r0 + 1) * wc].astype(jnp.float32),
                rhs_ref[:, r1 * wc:(r1 + 1) * wc].astype(jnp.float32),
            ),
            rhs_ref[:, r2 * wc:(r2 + 1) * wc].astype(jnp.float32),
        )
        mrow_ref[:, 0:8] = jnp.full((64, 8), _NEG, jnp.float32)
        mrow_ref[:, wc + 8:] = jnp.full((64, 8), _NEG, jnp.float32)
        mrow_ref[:, 8:wc + 8] = m3
        hm1 = jnp.maximum(
            jnp.maximum(mrow_ref[:, pl.ds(7, wc)],
                        mrow_ref[:, pl.ds(8, wc)]),
            mrow_ref[:, pl.ds(9, wc)],
        )
        hm = _dot(hm1.astype(sd), sel_ref[:])
        out_ref[0, yy] = jnp.transpose(hm, (1, 0)).astype(sd)


def _choose_tp(hp: int, ws: int, sz: int) -> int:
    for tp in (16, 12, 8, 6, 4, 2):
        if hp % tp:
            continue
        n_rows = 2 * tp + 1
        m = n_rows * ws
        vmem = (
            (2 * tp + 4) * _NP * (ws + 2 * _MARG) * 4   # xpw f32
            + 64 * m * sz                                # rhs (sd)
            + 64 * m * 4                                 # acc f32
            + 2 * 64 * m * 4                             # conv/bias temps
            + ws * (ws // 2) * sz                        # sel
            + 64 * (ws + 16) * 4                         # mrow
            + 2 * tp * (ws // 2) * 128 * sz              # out blocks (pad)
        )
        if vmem <= _VMEM_BUDGET:
            return tp
    return 2


def stem_pallas_apply(
    stem_params,
    xp: jnp.ndarray,
    image_mean,
    image_std,
    state_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused stem. xp: [N, Hs+4, 16, Ws] f32 rows-outermost planar s2d RAW
    image in [0,1] (normalization folded in; layout from planarize_image).
    Returns [N, Hs/2, Ws/2, 64] state_dtype — the XLA path's layer1 input
    (resnet_fpn.resnet50_fpn_apply:166-174).
    """
    n, hp4, c16, ws = xp.shape
    hs = hp4 - _TOP - _BOT
    assert c16 == _NP and hs % 4 == 0 and ws % 128 == 0, xp.shape
    hp, wp = hs // 2, ws // 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sd = jnp.dtype(state_dtype)

    w256, bias, _ = fold_stem_weights(
        stem_params["w"], stem_params["bn"]["scale"],
        stem_params["bn"]["bias"], image_mean, image_std,
    )
    w64 = jnp.transpose(w256, (1, 0)).astype(sd)             # [64, 256]
    b128 = jnp.broadcast_to(bias[:, None], (64, 128)).astype(jnp.float32)
    m16 = jnp.broadcast_to(
        mean_planes(image_mean)[:, None], (_NP, 128)
    ).astype(jnp.float32)
    # [Wc, Wp] stride-2 decimation: [x == 2x'']
    xi = jax.lax.broadcasted_iota(jnp.int32, (ws, wp), 0)
    ci = 2 * jax.lax.broadcasted_iota(jnp.int32, (ws, wp), 1)
    sel = (xi == ci).astype(sd)

    tp = _choose_tp(hp, ws, jnp.dtype(sd).itemsize)
    n_tiles = hp // tp
    n_rows = 2 * tp + 1

    kernel = functools.partial(
        _stem_kernel, tp=tp, n_tiles=n_tiles, hs=hs, ws=ws,
        interp=bool(interpret),
    )
    return pl.pallas_call(
        kernel,
        grid=(n * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((64, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NP, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, wp, 64), lambda i: (i // n_tiles, i % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, 64), sd),
        scratch_shapes=[
            pltpu.VMEM((2 * tp + 4, _NP, ws + 2 * _MARG), jnp.float32),
            pltpu.VMEM((64, n_rows * ws), sd),
            pltpu.VMEM((64, n_rows * ws), jnp.float32),
            pltpu.VMEM((64, ws + 16), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w64, b128, m16, sel)
