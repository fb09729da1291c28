"""MobileNetV3-Large + FPN backbone (the reference's mobile model family).

Functional JAX equivalent of the ``fasterrcnn_mobilenet_v3_large_fpn`` /
``..._320_fpn`` builders the reference vendors
(/root/reference/faster_rcnn.py:703-831): MobileNetV3-Large with frozen
BatchNorm, an FPN over the last two returned maps (both stride 32 — see the
C4_IDX note) plus a LastLevelMaxPool level — 3 output levels with 256
channels, and 5-sizes x 3-ratios anchors per location.

The 320 variant additionally runs at min_size=320 / max_size=640 with
reduced RPN budgets (pre/post NMS 150, score_thresh 0.05), wired in
models/factory.py.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from snn_automotive_object_detection_tpu.models.resnet_fpn import (
    _conv,
    _conv_init,
    _bn_init,
    _max_pool,
    _upsample_nearest_2x,
    FPN_CHANNELS,
)

# (kernel, expanded, out, use_se, use_hs, stride) — MobileNetV3-Large spec.
V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
LAST_CONV = 960
# torchvision 0.13 _mobilenet_extractor (backbone_utils.py): stage_indices =
# [0] + strided-block indices + [16] = [0, 2, 4, 7, 13, 16]; the FPN takes
# the last two -> "0" = output of features[13] (the stride-2 160-ch block,
# cumulative stride 32) and "1" = the final 1x1 conv (960 ch, stride 32).
# in_channels_list = [160, 960]. Both levels share the 1/32 resolution (the
# top-down "upsample" is a same-size add) — torchvision's actual behavior,
# and the layout the released mobilenet .pth checkpoints have
# (inner_blocks.0.weight is [256, 160, 1, 1]). features[13] is
# blocks[C4_IDX] here (features index = block index + 1).
C4_IDX = 12
C4_CHANNELS = 160


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def _dw_conv_init(key, k, c):
    # depthwise: HWIO with feature_group_count=c -> [k, k, 1, c]
    fan_out = k * k
    return jax.random.normal(key, (k, k, 1, c)) * np.sqrt(2.0 / fan_out)


def init_mobilenet_v3_fpn(key) -> Dict[str, Any]:
    keys = jax.random.split(key, len(V3_LARGE) + 8)
    params: Dict[str, Any] = {
        "stem": {"w": _conv_init(keys[0], 3, 3, 3, 16), "bn": _bn_init(16)}
    }
    cin = 16
    blocks = []
    for i, (k, exp, out, se, hs, stride) in enumerate(V3_LARGE):
        bk = jax.random.split(keys[i + 1], 6)
        p: Dict[str, Any] = {}
        if exp != cin:
            p["expand"] = {"w": _conv_init(bk[0], 1, 1, cin, exp), "bn": _bn_init(exp)}
        p["dw"] = {"w": _dw_conv_init(bk[1], k, exp), "bn": _bn_init(exp)}
        if se:
            sq = _make_divisible(exp // 4)
            p["se"] = {
                "fc1": {"w": _conv_init(bk[2], 1, 1, exp, sq), "b": jnp.zeros((sq,))},
                "fc2": {"w": _conv_init(bk[3], 1, 1, sq, exp), "b": jnp.zeros((exp,))},
            }
        p["project"] = {"w": _conv_init(bk[4], 1, 1, exp, out), "bn": _bn_init(out)}
        blocks.append(p)
        cin = out
    params["blocks"] = blocks
    params["last"] = {"w": _conv_init(keys[-3], 1, 1, cin, LAST_CONV),
                      "bn": _bn_init(LAST_CONV)}

    fk = jax.random.split(keys[-1], 4)
    params["fpn"] = {
        "inner": [
            {"w": _conv_init(fk[0], 1, 1, C4_CHANNELS, FPN_CHANNELS),
             "b": jnp.zeros((FPN_CHANNELS,))},
            {"w": _conv_init(fk[1], 1, 1, LAST_CONV, FPN_CHANNELS),
             "b": jnp.zeros((FPN_CHANNELS,))},
        ],
        "layer": [
            {"w": _conv_init(fk[2], 3, 3, FPN_CHANNELS, FPN_CHANNELS),
             "b": jnp.zeros((FPN_CHANNELS,))},
            {"w": _conv_init(fk[3], 3, 3, FPN_CHANNELS, FPN_CHANNELS),
             "b": jnp.zeros((FPN_CHANNELS,))},
        ],
    }
    return params


def _bn(x, p):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _dw_conv(x, w, stride):
    k = w.shape[0]
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _block(x, p, spec):
    k, exp, out, se, hs, stride = spec
    act = hardswish if hs else jax.nn.relu
    y = x
    if "expand" in p:
        y = act(_bn(_conv(y, p["expand"]["w"]), p["expand"]["bn"]))
    y = act(_bn(_dw_conv(y, p["dw"]["w"], stride), p["dw"]["bn"]))
    if se:
        s = y.mean(axis=(1, 2), keepdims=True)
        s = jax.nn.relu(_conv(s, p["se"]["fc1"]["w"]) + p["se"]["fc1"]["b"]).astype(y.dtype)
        s = hardsigmoid(_conv(s, p["se"]["fc2"]["w"]) + p["se"]["fc2"]["b"]).astype(y.dtype)
        y = y * s
    y = _bn(_conv(y, p["project"]["w"]), p["project"]["bn"])
    if stride == 1 and x.shape[-1] == out:
        y = y + x
    return y


def mobilenet_v3_fpn_apply(
    params: Dict[str, Any], x: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> List[jnp.ndarray]:
    """Returns 3 NHWC levels [P4 (stride 32), P5 (stride 32), pool (64)]."""
    x = x.astype(compute_dtype)
    y = hardswish(_bn(_conv(x, params["stem"]["w"], stride=2), params["stem"]["bn"]))
    c4 = None
    for i, (p, spec) in enumerate(zip(params["blocks"], V3_LARGE)):
        y = _block(y, p, spec)
        if i == C4_IDX:
            c4 = y
    c5 = hardswish(_bn(_conv(y, params["last"]["w"]), params["last"]["bn"]))

    fpn = params["fpn"]
    lat4 = _conv(c4, fpn["inner"][0]["w"]) + fpn["inner"][0]["b"].astype(c4.dtype)
    lat5 = _conv(c5, fpn["inner"][1]["w"]) + fpn["inner"][1]["b"].astype(c5.dtype)
    # Both levels live at stride 32 (see C4_IDX note): torchvision's
    # interpolate-to-size is the identity here, so add directly.
    p4 = (lat4 + lat5 if lat4.shape == lat5.shape
          else lat4 + _upsample_nearest_2x(lat5, lat4.shape[1:3]))
    outs = [
        _conv(p4, fpn["layer"][0]["w"]) + fpn["layer"][0]["b"].astype(p4.dtype),
        _conv(lat5, fpn["layer"][1]["w"]) + fpn["layer"][1]["b"].astype(lat5.dtype),
    ]
    outs.append(_max_pool(outs[-1], 1, 2, (0, 0)))
    return outs
