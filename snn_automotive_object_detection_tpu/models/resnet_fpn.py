"""ResNet-50 + FPN backbone, functional JAX, NHWC, frozen BatchNorm.

TPU-native equivalent of the torchvision backbone the reference builds via
``fasterrcnn_resnet50_fpn`` (/root/reference/faster_rcnn.py:628-700):
ImageNet ResNet-50 with FrozenBatchNorm2d, an FPN with out_channels=256 over
C2..C5, and a LastLevelMaxPool "pool" level — 5 output levels total.

The backbone always runs frozen in the reference (it is wrapped in
``torch.no_grad()`` — /root/reference/generalized_rcnn.py:93-94), so BatchNorm
is represented as a constant per-channel affine (scale, bias) computed from
the running statistics: scale = gamma / sqrt(var + eps), bias = beta - mean *
scale. XLA fuses the affine into the convolution.

Layout: NHWC activations, HWIO weights — the TPU-preferred convolution
layout. Compute dtype is configurable (bfloat16 by default on TPU; the MXU
accumulates in fp32 via preferred_element_type).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torchvision FrozenBatchNorm2d default
BLOCKS_PER_STAGE = (3, 4, 6, 3)  # ResNet-50
STAGE_WIDTHS = (256, 512, 1024, 2048)
FPN_CHANNELS = 256


# ------------------------------------------------------------------ init


def _conv_init(key, kh, kw, cin, cout):
    # He/fan-out init, matching torchvision's kaiming_normal_(mode="fan_out").
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _bn_init(cout):
    return {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}


def _bottleneck_init(key, cin, width, cout, stride):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": {"w": _conv_init(ks[0], 1, 1, cin, width), "bn": _bn_init(width)},
        "conv2": {"w": _conv_init(ks[1], 3, 3, width, width), "bn": _bn_init(width)},
        "conv3": {"w": _conv_init(ks[2], 1, 1, width, cout), "bn": _bn_init(cout)},
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "w": _conv_init(ks[3], 1, 1, cin, cout),
            "bn": _bn_init(cout),
        }
    return p


def init_resnet50_fpn(key) -> Dict[str, Any]:
    """Random-init parameter pytree (pretrained weights load via
    utils.checkpoint_convert when a .pth is available)."""
    keys = jax.random.split(key, 16)
    params: Dict[str, Any] = {
        "stem": {"w": _conv_init(keys[0], 7, 7, 3, 64), "bn": _bn_init(64)}
    }
    cin = 64
    k_idx = 1
    for stage, (n_blocks, cout) in enumerate(zip(BLOCKS_PER_STAGE, STAGE_WIDTHS)):
        width = cout // 4
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            blocks.append(
                _bottleneck_init(keys[k_idx], cin if b == 0 else cout, width, cout, stride)
            )
            k_idx += 1
        params[f"layer{stage + 1}"] = blocks
        cin = cout

    fk = jax.random.split(keys[15], 8)
    inner, layer = [], []
    for i, c in enumerate(STAGE_WIDTHS):
        # torchvision FPN convs: kaiming_uniform(a=1) + zero bias; exact init
        # scheme is irrelevant for frozen use, He-normal is fine here.
        inner.append({"w": _conv_init(fk[2 * i], 1, 1, c, FPN_CHANNELS),
                      "b": jnp.zeros((FPN_CHANNELS,))})
        layer.append({"w": _conv_init(fk[2 * i + 1], 3, 3, FPN_CHANNELS, FPN_CHANNELS),
                      "b": jnp.zeros((FPN_CHANNELS,))})
    params["fpn"] = {"inner": inner, "layer": layer}
    return params


# ------------------------------------------------------------------ apply


def _conv(x, w, stride=1, padding=None):
    # Explicit symmetric padding (torch semantics): XLA's "SAME" pads
    # asymmetrically for even inputs at stride 2, which would shift sampling
    # vs the reference.
    if padding is None:
        kh, kw = w.shape[0], w.shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    # fp32 mode is the parity mode: force true fp32 MXU passes (the TPU
    # default for f32 operands is bf16-pass multiplication).
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    # 1x1 convs as flat GEMMs. Standalone microbenches are CONTRADICTORY
    # here (FPN laterals: GEMM 1.83 vs conv 2.80 ms; bottleneck stacks:
    # GEMM 6.13 vs conv 3.80 ms standalone) but the END-TO-END detector is
    # unambiguous in a same-session A/B: all-1x1-GEMM 51.8 img/s vs
    # laterals-only 48.7 (batch 2) — in context the GEMM form gives XLA
    # better layouts around the Pallas kernels. Trust e2e (CLAUDE.md).
    # Stride-2 subsamples rows first — exact, the conv never reads the
    # skipped pixels. Same f32 MXU accumulation; only reduction order can
    # differ from the conv lowering (bf16 1-ulp class).
    if w.shape[0] == 1 and w.shape[1] == 1 and padding == [(0, 0), (0, 0)]:
        if stride > 1:
            x = x[:, ::stride, ::stride]
        n, h, wd, ci = x.shape
        y = jnp.dot(
            x.reshape(n * h * wd, ci),
            w.reshape(ci, -1).astype(x.dtype),
            precision=precision,
            preferred_element_type=x.dtype,
        )
        return y.reshape(n, h, wd, -1)
    # Emit the operand dtype (not preferred_element_type=f32): XLA still
    # accumulates in f32 on the MXU and every caller rounds to x.dtype
    # anyway, while a f32 cotangent would break conv_general_dilated's
    # transpose rule under bf16 train_backbone (same fix as heads._linear,
    # measured identical forward values).
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    )


def _conv_bn(x, p, stride=1, relu=True):
    y = _conv(x, p["w"], stride)
    y = y * p["bn"]["scale"].astype(y.dtype) + p["bn"]["bias"].astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def _bottleneck(x, p, stride):
    out = _conv_bn(x, p["conv1"])
    out = _conv_bn(out, p["conv2"], stride=stride)
    out = _conv_bn(out, p["conv3"], relu=False)
    if "downsample" in p:
        x = _conv_bn(x, p["downsample"], stride=stride, relu=False)
    return jax.nn.relu(out + x)


def _max_pool(x, window, stride, padding):
    # init must be a concrete constant (not traced) for the reduce_window
    # autodiff rule to apply.
    return jax.lax.reduce_window(
        x,
        np.array(-np.inf, jnp.dtype(x.dtype)),
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), padding, padding, (0, 0)],
    )


def _upsample_nearest_2x(x, target_hw):
    """Nearest upsample to exactly target_hw (2x in the standard pyramid)."""
    n, h, w, c = x.shape
    th, tw = target_hw
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, :th, :tw, :]


def resnet50_fpn_apply(
    params: Dict[str, Any], x: jnp.ndarray, compute_dtype=jnp.bfloat16,
    trainable_layers: int = 0, fpn_pallas: bool = False,
) -> List[jnp.ndarray]:
    """Backbone forward. x: [N, H, W, 3] normalized float.

    Returns 5 NHWC feature maps [P2, P3, P4, P5, P6(pool)] with 256 channels,
    strides 4/8/16/32/64 — the levels the reference exposes as features
    "0".."3" and "pool".

    trainable_layers: gradients flow into the top N ResNet stages
    (torchvision _resnet_fpn_extractor order: 1 -> layer4 ... 5 -> + stem);
    a stop_gradient sits at the frozen-prefix boundary so the backward
    never traverses frozen stages. 0 = fully frozen prefix — the CALLER
    decides whether the FPN output itself is stop_gradient-ed (the
    reference's no_grad quirk, models/detector.py).
    """
    x = x.astype(compute_dtype)

    # Stem: 7x7/2 (pad 3) + maxpool 3x3/2 (pad 1)
    y = _conv(x, params["stem"]["w"], stride=2, padding=[(3, 3), (3, 3)])
    y = y * params["stem"]["bn"]["scale"].astype(y.dtype) + params["stem"]["bn"][
        "bias"
    ].astype(y.dtype)
    y = jax.nn.relu(y)
    y = _max_pool(y, 3, 2, (1, 1))
    return resnet50_fpn_apply_from_p1(params, y, trainable_layers,
                                      fpn_pallas=fpn_pallas)


def resnet50_fpn_apply_from_p1(
    params: Dict[str, Any], y: jnp.ndarray, trainable_layers: int = 0,
    fpn_pallas: bool = False,
) -> List[jnp.ndarray]:
    """Layers 1-4 + FPN from the stem/pool output [N, H/4, W/4, 64].

    Split out so the fused Pallas stem (ops/pallas_stem.py — TPU bf16
    inference) can replace the stem stage above and feed the rest."""
    # Stage layer{stage+1} is trainable iff trainable_layers >= 5 - (stage
    # + 1); the trainable set is a suffix, so a stop_gradient at the first
    # trainable stage's input cuts the main chain — and each FROZEN stage's
    # FPN lateral tap must be cut too (C2..C4 feed the FPN directly, a
    # gradient path around the boundary).
    if trainable_layers >= 5:
        first_trainable = 0
    elif trainable_layers <= 0:
        first_trainable = 4  # fully frozen; the CALLER stop_gradients feats
    else:
        first_trainable = 4 - trainable_layers
    cs = []
    for stage in range(4):
        if 1 <= trainable_layers <= 4 and stage == first_trainable:
            y = jax.lax.stop_gradient(y)
        blocks = params[f"layer{stage + 1}"]
        for b, bp in enumerate(blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            y = _bottleneck(y, bp, stride)
        cs.append(jax.lax.stop_gradient(y) if stage < first_trainable else y)

    # FPN top-down
    fpn = params["fpn"]

    if fpn_pallas:
        # Fused Pallas FPN (ops/pallas_fpn.py): lateral + merge + outer 3x3
        # per level in one kernel, ~1/3 the HBM traffic of this XLA tail.
        # Inference-only (the caller gates on training/dtype/backend).
        from snn_automotive_object_detection_tpu.ops.pallas_fpn import (
            fpn_pallas_apply,
        )

        return fpn_pallas_apply(cs, fpn)

    def inner(i, t):
        return _conv(t, fpn["inner"][i]["w"]) + fpn["inner"][i]["b"].astype(t.dtype)

    def outer(i, t):
        return _conv(t, fpn["layer"][i]["w"]) + fpn["layer"][i]["b"].astype(t.dtype)

    laterals = [inner(i, c) for i, c in enumerate(cs)]
    p5 = laterals[3]
    p4 = laterals[2] + _upsample_nearest_2x(p5, laterals[2].shape[1:3])
    p3 = laterals[1] + _upsample_nearest_2x(p4, laterals[1].shape[1:3])
    p2 = laterals[0] + _upsample_nearest_2x(p3, laterals[0].shape[1:3])

    outs = [outer(0, p2), outer(1, p3), outer(2, p4), outer(3, p5)]
    # LastLevelMaxPool: kernel 1, stride 2 (pure subsampling).
    outs.append(_max_pool(outs[3], 1, 2, (0, 0)))
    return outs
