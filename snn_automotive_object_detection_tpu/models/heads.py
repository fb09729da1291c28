"""RPN and box-head networks: spiking (LIF scan) and ANN variants.

Reference behaviour being reproduced:
  * ``RPNHeadSNN`` (/root/reference/rpn.py:33-121): per FPN level, a T_rpn-step
    unroll of [constant-current LIF encoder (v_th=0.25) -> 3x3 conv (bias-free)
    -> LIFCell (alpha=100, v_th=0.1) -> two 1x1 convs (bias-free) -> LICell
    leaky integrators]; the FINAL-step LI membrane potentials are the
    objectness / box-delta logits.
  * ``FastRCNNPredictorSNNFull`` (/root/reference/faster_rcnn.py:414-516):
    flattened 256*7*7 RoI features, T_det-step unroll of [encoder -> fc6
    (12544->1024) -> LIF -> fc7 (1024->1024) -> LIF -> cls/bbox linears ->
    LICells]; final membranes are the class logits / box deltas.
  * ANN counterparts ``RPNHead`` (rpn.py:203-245), ``TwoMLPHead`` +
    ``FastRCNNPredictor`` (faster_rcnn.py:320-411).

TPU-first: the time axis is a ``lax.scan`` (single compiled step, weights
stay resident), not a Python unroll. Spike-rate accumulators are first-class,
flag-gated scan outputs — replacing the reference's comment-toggled
"### EXTRACT SPIKE RATES ###" source hack (rpn.py:123-201,
faster_rcnn.py:518-619). Reported rates match the reference convention:
mean spikes per neuron per timestep (sum over T / T, averaged over all
neurons of the layer), one value per image (RPN) or per RoI (detector).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snn_automotive_object_detection_tpu.snn import functional as snnf


# ------------------------------------------------------------------ helpers


def _precision(x):
    # fp32 mode is the parity mode: force true fp32 MXU passes (the TPU
    # default for f32 operands uses bf16-pass multiplication).
    return (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


# In bf16 mode the conv/GEMM output dtype is bf16: XLA still accumulates in
# f32 on the MXU and rounds once on output — identical values to requesting
# an f32 output and casting (which every call site did), but the backward
# pass gets dtype-consistent operands (an f32 preferred_element_type makes
# the cotangent f32 while the saved operands are bf16, and
# conv_general_dilated's transpose rejects the mix).


def _conv(x, w, stride=1):
    kh, kw = w.shape[0], w.shape[1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],  # torch semantics
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision(x),
        preferred_element_type=x.dtype,
    )


def _linear(x, w, b=None):
    y = jnp.dot(x, w.astype(x.dtype), precision=_precision(x),
                preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def _normal_conv(key, kh, kw, cin, cout, std=0.01):
    """Reference RPN-head init: normal(std=0.01), zero bias (rpn.py:77-82)."""
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _torch_linear_init(key, cin, cout, bias=True):
    """torch.nn.Linear default init: U(-1/sqrt(cin), 1/sqrt(cin))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin)
    w = jax.random.uniform(k1, (cin, cout), minval=-bound, maxval=bound)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(k2, (cout,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


# ================================================================== RPN SNN


def init_rpn_head_snn(key, in_channels: int = 256, num_anchors: int = 3):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "shared_conv": {"w": _normal_conv(k1, 3, 3, in_channels, in_channels)},
        "conv_cls": {"w": _normal_conv(k2, 1, 1, in_channels, num_anchors)},
        "conv_bbox": {"w": _normal_conv(k3, 1, 1, in_channels, num_anchors * 4)},
    }


def rpn_head_snn_apply(
    params: Dict[str, Any],
    features: List[jnp.ndarray],
    num_steps: int,
    collect_rates: bool = False,
    compute_dtype=jnp.bfloat16,
    fast_encoder: bool = False,
    state_dtype=None,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], Optional[Dict[str, jnp.ndarray]]]:
    """Spiking RPN head over all FPN levels.

    features: list of [N, H_l, W_l, C] maps. Returns (objectness list
    [N, H_l, W_l, A], bbox list [N, H_l, W_l, 4A], rates or None).

    rates (when collected): dict with per-level arrays of shape [N]:
    "shared" (the spiking conv layer the energy analysis consumes,
    train.py:482-488) and "encoder". The LI readout layers do not spike, so
    no rate is collected for them (the reference's rpn.py:164-165 records
    membrane means it never uses).
    """
    logits, bbox_reg = [], []
    rates: Dict[str, List[jnp.ndarray]] = {"encoder": [], "shared": []}

    w_shared = params["shared_conv"]["w"]
    w_cls = params["conv_cls"]["w"]
    w_bbox = params["conv_bbox"]["w"]
    # The two 1x1 readout convs and their leaky integrators are per-channel
    # linear: fuse them into ONE conv + ONE LI over A + 4A channels (reads
    # the spike tensor once per step instead of twice), split at the end.
    w_out = jnp.concatenate([w_cls, w_bbox], axis=-1)

    # LIF state is carried in compute_dtype by default: the big
    # [N, H, W, 256] membrane and current tensors dominate HBM traffic at
    # fp32 (the SNN step loop is memory-bound, not FLOP-bound). fp32 mode
    # remains available for bit-level parity runs via
    # compute_dtype=jnp.float32. state_dtype (when it differs) carries ONLY
    # the neuron states (encoder/LIF membranes + currents, LI readout) in
    # that dtype while convs stay in compute_dtype — the reference's AMP
    # semantics (train.py:79 autocasts convs, norse state stays fp32).
    cd = compute_dtype
    sd = state_dtype or cd
    for feat in features:
        x = feat.astype(cd)
        n, h, w, c = x.shape
        a = w_cls.shape[-1]
        # Constant-current encoder in closed form: one period map replaces
        # the carried membrane (see snnf.encoder_periods).
        periods = snnf.encoder_periods(x) if fast_encoder else None

        def step(carry, t):
            v_enc, lif, li_out, cnt_enc, cnt_shared = carry
            if fast_encoder:
                z = snnf.encoder_spikes_at(periods, t, cd)
            else:
                z, v_enc = snnf.lif_current_encoder(x.astype(sd), v_enc)
            cur = _conv(z.astype(cd), w_shared).astype(sd)
            s, lif = snnf.lif_feed_forward_step(cur, lif)
            _, li_out = snnf.li_feed_forward_step(
                _conv(s.astype(cd), w_out).astype(sd), li_out)
            if collect_rates:
                cnt_enc = cnt_enc + z.astype(jnp.float32).sum(axis=(1, 2, 3))
                cnt_shared = cnt_shared + s.astype(jnp.float32).sum(axis=(1, 2, 3))
            return (v_enc, lif, li_out, cnt_enc, cnt_shared), None

        carry0 = (
            jnp.zeros((1,), sd) if fast_encoder else jnp.zeros(x.shape, sd),
            snnf.zeros_lif_state(x.shape, sd),
            snnf.zeros_li_state((n, h, w, 5 * a), sd),
            jnp.zeros((n,)),
            jnp.zeros((n,)),
        )
        (v_enc, lif, li_out, cnt_enc, cnt_shared), _ = jax.lax.scan(
            step, carry0, jnp.arange(num_steps)
        )
        mem = li_out.v.astype(jnp.float32)
        logits.append(mem[..., :a])
        bbox_reg.append(mem[..., a:])
        if collect_rates:
            numel = h * w * c
            rates["encoder"].append(cnt_enc / (num_steps * numel))
            rates["shared"].append(cnt_shared / (num_steps * numel))

    out_rates = None
    if collect_rates:
        out_rates = {k: jnp.stack(v, axis=0) for k, v in rates.items()}  # [L, N]
    return logits, bbox_reg, out_rates


# ================================================================== RPN ANN


def init_rpn_head_ann(key, in_channels: int = 256, num_anchors: int = 3):
    """ANN RPN head (conv+ReLU then 1x1 heads, with biases)."""
    k1, k2, k3 = jax.random.split(key, 3)
    zero = jnp.zeros
    return {
        "conv": {"w": _normal_conv(k1, 3, 3, in_channels, in_channels),
                 "b": zero((in_channels,))},
        "cls_logits": {"w": _normal_conv(k2, 1, 1, in_channels, num_anchors),
                       "b": zero((num_anchors,))},
        "bbox_pred": {"w": _normal_conv(k3, 1, 1, in_channels, num_anchors * 4),
                      "b": zero((num_anchors * 4,))},
    }


def rpn_head_ann_apply(params, features, compute_dtype=jnp.bfloat16):
    logits, bbox_reg = [], []
    for feat in features:
        x = feat.astype(compute_dtype)
        t = jax.nn.relu(_conv(x, params["conv"]["w"]) + params["conv"]["b"])
        t = t.astype(compute_dtype)
        logits.append(
            (_conv(t, params["cls_logits"]["w"]) + params["cls_logits"]["b"]).astype(jnp.float32)
        )
        bbox_reg.append(
            (_conv(t, params["bbox_pred"]["w"]) + params["bbox_pred"]["b"]).astype(jnp.float32)
        )
    return logits, bbox_reg, None


# ============================================================ Box head: SNN


def init_fastrcnn_snn(
    key, in_channels: int = 256 * 7 * 7, representation_size: int = 1024,
    num_classes: int = 9, only_one_bbox: bool = False
):
    ks = jax.random.split(key, 4)
    n_reg = 4 if only_one_bbox else num_classes * 4
    return {
        "fc6": _torch_linear_init(ks[0], in_channels, representation_size, bias=False),
        "fc7": _torch_linear_init(ks[1], representation_size, representation_size, bias=False),
        "cls_score": _torch_linear_init(ks[2], representation_size, num_classes, bias=False),
        "bbox_pred": _torch_linear_init(ks[3], representation_size, n_reg, bias=False),
    }


def fastrcnn_snn_apply(
    params: Dict[str, Any],
    x: jnp.ndarray,
    num_steps: int,
    collect_rates: bool = False,
    compute_dtype=jnp.bfloat16,
    fast_encoder: bool = False,
    precompute_fc6: bool = False,
    pallas_fc6: bool = False,
    pallas_tail: bool = False,
    state_dtype=None,
):
    """Spiking box head. x: [R, C*7*7] flattened RoI features.

    Returns (class_logits [R, num_classes], bbox_deltas [R, n_reg], rates).
    rates: {"encoder", "fc6", "fc7"}: [R] mean spikes/neuron/step.

    precompute_fc6 (inference): the encoder spike train is known a priori in
    closed form, so fc6 input currents for ALL T steps are ONE
    [T*R, d_in] @ [d_in, rep] GEMM — the 25.7 MB fc6 weight is read once
    instead of per step, and the encoder membrane never round-trips HBM.
    The sequential LIF/fc7/readout scan then consumes the precomputed
    currents. Spike trains are identical to fast_encoder=True.
    """
    cd = compute_dtype  # GEMM operand dtype
    sd = state_dtype or cd  # carried neuron states (see rpn_head_snn_apply)
    x = x.astype(cd)
    r, d_in = x.shape
    rep = params["fc6"]["w"].shape[1]
    n_cls = params["cls_score"]["w"].shape[1]
    n_reg = params["bbox_pred"]["w"].shape[1]

    w6 = params["fc6"]["w"]
    w7 = params["fc7"]["w"]
    wc = params["cls_score"]["w"]
    wb = params["bbox_pred"]["w"]

    if pallas_fc6:
        # Fused Pallas encoder + k-tiled fc6 GEMM (snn/pallas_fc6.py): zero
        # encoder-state HBM traffic, fc6 weight streamed once per 128-row
        # tile; the cheap [R, 1024] LIF/fc7/readout scan consumes the
        # precomputed currents.
        from snn_automotive_object_detection_tpu.snn.pallas_fc6 import (
            encoder_fc6_pallas,
        )

        cur6_all, enc_counts = encoder_fc6_pallas(
            x, w6, num_steps, state_dtype=cd, collect_rates=collect_rates
        )
        from snn_automotive_object_detection_tpu.snn.pallas_tail import (
            box_tail_pallas,
            tail_supported,
        )

        if (
            pallas_tail
            and cd == jnp.bfloat16
            and sd == jnp.float32
            and tail_supported(rep, n_cls, n_reg, num_steps)
        ):
            # Fused VMEM-resident LIF/fc7/readout tail (snn/pallas_tail.py):
            # bit-identical to _fastrcnn_snn_from_cur6 at the production
            # (bf16 compute, f32 state) numerics, ~5x less HBM traffic.
            cls_v, box_v, c6, c7 = box_tail_pallas(
                cur6_all.astype(cd), w7, wc, wb, num_steps,
                collect_rates=collect_rates,
            )
            rates = None
            if collect_rates:
                rates = {
                    "encoder": enc_counts / (num_steps * d_in),
                    "fc6": c6 / (num_steps * rep),
                    "fc7": c7 / (num_steps * rep),
                }
            return cls_v, box_v, rates
        return _fastrcnn_snn_from_cur6(
            cur6_all.astype(cd), w7, wc, wb, num_steps, collect_rates, cd,
            enc_counts=enc_counts, d_in=d_in, state_dtype=sd,
        )

    if precompute_fc6:
        return _fastrcnn_snn_precomputed(
            x, w6, w7, wc, wb, num_steps, collect_rates, cd, state_dtype=sd
        )

    periods = snnf.encoder_periods(x) if fast_encoder else None

    def step(carry, t):
        v_enc, l6, l7, li_c, li_b, c_enc, c6, c7 = carry
        if fast_encoder:
            z = snnf.encoder_spikes_at(periods, t, cd)
        else:
            z, v_enc = snnf.lif_current_encoder(x.astype(sd), v_enc)
        s6, l6 = snnf.lif_feed_forward_step(
            _linear(z.astype(cd), w6).astype(sd), l6)
        s7, l7 = snnf.lif_feed_forward_step(
            _linear(s6.astype(cd), w7).astype(sd), l7)
        mc, li_c = snnf.li_feed_forward_step(
            _linear(s7.astype(cd), wc).astype(sd), li_c)
        mb, li_b = snnf.li_feed_forward_step(
            _linear(s7.astype(cd), wb).astype(sd), li_b)
        if collect_rates:
            c_enc = c_enc + z.astype(jnp.float32).sum(axis=1)
            c6 = c6 + s6.astype(jnp.float32).sum(axis=1)
            c7 = c7 + s7.astype(jnp.float32).sum(axis=1)
        return (v_enc, l6, l7, li_c, li_b, c_enc, c6, c7), None

    carry0 = (
        jnp.zeros((1,), sd) if fast_encoder else jnp.zeros(x.shape, sd),
        snnf.zeros_lif_state((r, rep), sd),
        snnf.zeros_lif_state((r, rep), sd),
        snnf.zeros_li_state((r, n_cls), sd),
        snnf.zeros_li_state((r, n_reg), sd),
        jnp.zeros((r,)),
        jnp.zeros((r,)),
        jnp.zeros((r,)),
    )
    (v_enc, l6, l7, li_c, li_b, c_enc, c6, c7), _ = jax.lax.scan(
        step, carry0, jnp.arange(num_steps)
    )

    rates = None
    if collect_rates:
        rates = {
            "encoder": c_enc / (num_steps * d_in),
            "fc6": c6 / (num_steps * rep),
            "fc7": c7 / (num_steps * rep),
        }
    return li_c.v.astype(jnp.float32), li_b.v.astype(jnp.float32), rates


def _fastrcnn_snn_precomputed(x, w6, w7, wc, wb, num_steps, collect_rates,
                              cd, state_dtype=None):
    """Stacked-T fc6 formulation of the spiking box head (see
    fastrcnn_snn_apply docstring). Spike semantics identical to the
    fast_encoder path; only the GEMM schedule differs."""
    r, d_in = x.shape
    rep = w6.shape[1]

    periods = snnf.encoder_periods(x)  # [R, d_in] uint8
    t_idx = (jnp.arange(num_steps) + 1).astype(jnp.uint8)
    z_all = (jnp.mod(t_idx[:, None, None], periods[None]) == 0).astype(cd)
    cur6_all = _linear(z_all.reshape(num_steps * r, d_in), w6)
    cur6_all = cur6_all.astype(cd).reshape(num_steps, r, rep)

    enc_counts = (
        z_all.astype(jnp.float32).sum(axis=(0, 2)) if collect_rates else None
    )
    return _fastrcnn_snn_from_cur6(
        cur6_all, w7, wc, wb, num_steps, collect_rates, cd,
        enc_counts=enc_counts, d_in=d_in, state_dtype=state_dtype,
    )


def _fastrcnn_snn_from_cur6(cur6_all, w7, wc, wb, num_steps, collect_rates,
                            cd, enc_counts=None, d_in=None,
                            state_dtype=None):
    """Sequential LIF/fc7/readout tail over precomputed fc6 input currents
    cur6_all [T, R, rep] (shared by the stacked-T XLA path above and the
    fused Pallas encoder+fc6 kernel, snn/pallas_fc6.py)."""
    sd = state_dtype or cd
    _, r, rep = cur6_all.shape
    n_cls = wc.shape[1]
    n_reg = wb.shape[1]

    def step(carry, cur6):
        l6, l7, li_c, li_b, c6, c7 = carry
        s6, l6 = snnf.lif_feed_forward_step(cur6.astype(sd), l6)
        s7, l7 = snnf.lif_feed_forward_step(
            _linear(s6.astype(cd), w7).astype(sd), l7)
        _, li_c = snnf.li_feed_forward_step(
            _linear(s7.astype(cd), wc).astype(sd), li_c)
        _, li_b = snnf.li_feed_forward_step(
            _linear(s7.astype(cd), wb).astype(sd), li_b)
        if collect_rates:
            c6 = c6 + s6.astype(jnp.float32).sum(axis=1)
            c7 = c7 + s7.astype(jnp.float32).sum(axis=1)
        return (l6, l7, li_c, li_b, c6, c7), None

    carry0 = (
        snnf.zeros_lif_state((r, rep), sd),
        snnf.zeros_lif_state((r, rep), sd),
        snnf.zeros_li_state((r, n_cls), sd),
        snnf.zeros_li_state((r, n_reg), sd),
        jnp.zeros((r,)),
        jnp.zeros((r,)),
    )
    (l6, l7, li_c, li_b, c6, c7), _ = jax.lax.scan(step, carry0, cur6_all)

    rates = None
    if collect_rates:
        rates = {
            "encoder": enc_counts / (num_steps * d_in),
            "fc6": c6 / (num_steps * rep),
            "fc7": c7 / (num_steps * rep),
        }
    return li_c.v.astype(jnp.float32), li_b.v.astype(jnp.float32), rates


# ============================================================ Box head: ANN


def init_two_mlp_head(key, in_channels: int = 256 * 7 * 7, representation_size: int = 1024):
    k1, k2 = jax.random.split(key)
    return {
        "fc6": _torch_linear_init(k1, in_channels, representation_size),
        "fc7": _torch_linear_init(k2, representation_size, representation_size),
    }


def two_mlp_head_apply(params, x, compute_dtype=jnp.bfloat16):
    x = x.astype(compute_dtype)
    x = jax.nn.relu(_linear(x, params["fc6"]["w"], params["fc6"]["b"]))
    x = jax.nn.relu(_linear(x.astype(compute_dtype), params["fc7"]["w"], params["fc7"]["b"]))
    return x.astype(jnp.float32)


def init_fastrcnn_predictor(key, representation_size: int = 1024, num_classes: int = 9):
    k1, k2 = jax.random.split(key)
    return {
        "cls_score": _torch_linear_init(k1, representation_size, num_classes),
        "bbox_pred": _torch_linear_init(k2, representation_size, num_classes * 4),
    }


def fastrcnn_predictor_apply(params, x):
    cls = _linear(x, params["cls_score"]["w"], params["cls_score"]["b"])
    reg = _linear(x, params["bbox_pred"]["w"], params["bbox_pred"]["b"])
    return cls, reg


# ------------------------------------------------------ FLOP bookkeeping


def rpn_level_flops(h: int, w: int, in_channels: int = 256) -> float:
    """FLOPs/inference of the RPN shared 3x3 conv at one level — the constant
    paired with its spike rate by the energy analysis (rpn.py:177-180)."""
    return 9.0 * h * w * in_channels * in_channels


def fc_flops(cin: int, cout: int) -> float:
    """Per-RoI FLOPs of an FC layer (faster_rcnn.py spike-rate bookkeeping);
    the analysis multiplies by the 1000 eval RoIs (train.py:494)."""
    return float(cin) * float(cout)
