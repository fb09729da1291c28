"""Reference-equivalent PyTorch CPU pipeline (baseline + parity oracle).

An independent reimplementation of the reference model's inference math in
plain torch (torchvision/norse are NOT installed here), built from the same
published semantics this framework targets:

  * ResNet-50 + FPN with FrozenBatchNorm, torchvision state-dict key names
    (so ``utils.checkpoint.convert_torch_state_dict`` can consume its
    state_dict directly — that's how the converter and the JAX model are
    cross-validated without the released checkpoints)
  * norse 0.0.7 LIF equations (encoder / feed-forward LIF / leaky integrator)
  * RPNHeadSNN / FastRCNNPredictorSNNFull unrolls
    (/root/reference/rpn.py:84-121, faster_rcnn.py:470-516)
  * anchor grids, proposal filtering with per-level NMS, multiscale RoIAlign
    (aligned=False), per-class NMS postprocess

Used by tests/test_parity_torch.py (same weights, same input -> same
detections) and tools/bench_baseline.py (the CPU images/sec denominator for
bench.py's vs_baseline).

This file intentionally lives OUTSIDE the TPU package: it is tooling, not a
compute path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ------------------------------------------------------------ norse math

DT = 1e-3
TAU_MEM_INV = 100.0
TAU_SYN_INV = 200.0


def lif_current_encoder(x, v, v_th=0.25):
    v = v + DT * TAU_MEM_INV * (-v + x)
    z = (v > v_th).to(x.dtype)
    v = v - z * v
    return z, v


def lif_step(cur, state, v_th=0.1):
    v, i = state
    v_dec = v + DT * TAU_MEM_INV * (-v + i)
    i_dec = i - DT * TAU_SYN_INV * i
    z = (v_dec > v_th).to(cur.dtype)
    v = (1 - z) * v_dec
    i = i_dec + cur
    return z, (v, i)


def li_step(cur, state):
    v, i = state
    i = i + cur
    v = v + DT * TAU_MEM_INV * (-v + i)
    i = i - DT * TAU_SYN_INV * i
    return v, (v, i)


# ------------------------------------------------------------ backbone


class FrozenBN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var + 1e-5)
        return x * scale[None, :, None, None] + (
            self.bias - self.running_mean * scale
        )[None, :, None, None]


class Bottleneck(nn.Module):
    def __init__(self, cin, width, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = FrozenBN(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = FrozenBN(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = FrozenBN(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), FrozenBN(cout)
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sc)


class ResNet50Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = FrozenBN(64)
        widths = (256, 512, 1024, 2048)
        blocks = (3, 4, 6, 3)
        cin = 64
        for s, (n, cout) in enumerate(zip(blocks, widths), start=1):
            layer = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 1) else 1
                layer.append(Bottleneck(cin if b == 0 else cout, cout // 4,
                                        cout, stride))
            setattr(self, f"layer{s}", nn.Sequential(*layer))
            cin = cout

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class FPN(nn.Module):
    def __init__(self, channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in channels]
        )
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in channels]
        )

    def forward(self, cs):
        laterals = [m(c) for m, c in zip(self.inner_blocks, cs)]
        p5 = laterals[3]
        p4 = laterals[2] + F.interpolate(p5, size=laterals[2].shape[-2:], mode="nearest")
        p3 = laterals[1] + F.interpolate(p4, size=laterals[1].shape[-2:], mode="nearest")
        p2 = laterals[0] + F.interpolate(p3, size=laterals[0].shape[-2:], mode="nearest")
        outs = [m(p) for m, p in zip(self.layer_blocks, [p2, p3, p4, p5])]
        outs.append(F.max_pool2d(outs[-1], 1, 2))
        return outs


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = ResNet50Body()
        self.fpn = FPN()

    def forward(self, x):
        return self.fpn(self.body(x))


# ------------------------------------------------ MobileNetV3-Large mirror
# torchvision 0.13 mobilenet_v3_large key layout (features.{i}; Conv2dNorm-
# Activation = .0 conv / .1 norm; InvertedResidual = .block.{j}; SE =
# .fc1/.fc2), so convert_torch_state_dict's mobilenet branch is validated
# against a real torch forward (reference builders faster_rcnn.py:703-831).

# (kernel, expanded, out, use_se, use_hs, stride) — must match
# models/mobilenet_fpn.V3_LARGE.
V3_LARGE_SPEC = [
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


def _mnv3_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvNormAct(nn.Module):
    """Conv2dNormActivation with frozen BN: submodules named "0"/"1"."""

    def __init__(self, cin, cout, k=1, stride=1, groups=1, act="hs"):
        super().__init__()
        self.add_module("0", nn.Conv2d(cin, cout, k, stride, k // 2,
                                       groups=groups, bias=False))
        self.add_module("1", FrozenBN(cout))
        self._act = act

    def forward(self, x):
        x = getattr(self, "1")(getattr(self, "0")(x))
        if self._act == "hs":
            return F.hardswish(x)
        if self._act == "relu":
            return F.relu(x)
        return x


class _SqueezeExcitation(nn.Module):
    def __init__(self, c, sq):
        super().__init__()
        self.fc1 = nn.Conv2d(c, sq, 1)
        self.fc2 = nn.Conv2d(sq, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.hardsigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class _InvertedResidual(nn.Module):
    def __init__(self, cin, spec):
        super().__init__()
        k, exp, out, se, hs, stride = spec
        act = "hs" if hs else "relu"
        layers = []
        if exp != cin:
            layers.append(_ConvNormAct(cin, exp, 1, act=act))
        layers.append(_ConvNormAct(exp, exp, k, stride, groups=exp, act=act))
        if se:
            layers.append(_SqueezeExcitation(exp, _mnv3_divisible(exp // 4)))
        layers.append(_ConvNormAct(exp, out, 1, act=None))
        self.block = nn.Sequential(*layers)
        self._residual = stride == 1 and cin == out

    def forward(self, x):
        y = self.block(x)
        return x + y if self._residual else y


class MobileNetV3Body(nn.Module):
    """features.0..16; returns [features[13] out (160ch), features[16] out
    (960ch)] — torchvision _mobilenet_extractor's two FPN inputs."""

    def __init__(self):
        super().__init__()
        self.add_module("0", _ConvNormAct(3, 16, 3, 2, act="hs"))
        cin = 16
        for i, spec in enumerate(V3_LARGE_SPEC):
            self.add_module(str(i + 1), _InvertedResidual(cin, spec))
            cin = spec[2]
        self.add_module("16", _ConvNormAct(cin, 960, 1, act="hs"))

    def forward(self, x):
        c4 = None
        for i in range(17):
            x = getattr(self, str(i))(x)
            if i == 13:
                c4 = x
        return [c4, x]


class MobileFPN(nn.Module):
    def __init__(self, channels=(160, 960), out=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in channels]
        )
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in channels]
        )

    def forward(self, cs):
        lat = [m(c) for m, c in zip(self.inner_blocks, cs)]
        p4 = lat[0] + F.interpolate(lat[1], size=lat[0].shape[-2:],
                                    mode="nearest")
        outs = [self.layer_blocks[0](p4), self.layer_blocks[1](lat[1])]
        outs.append(F.max_pool2d(outs[-1], 1, 2))
        return outs


class MobileBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = MobileNetV3Body()
        self.fpn = MobileFPN()

    def forward(self, x):
        return self.fpn(self.body(x))


# ------------------------------------------------------------ SNN heads


class RPNHeadSNNMirror(nn.Module):
    def __init__(self, c=256, a=3, num_steps=8):
        super().__init__()
        self.num_steps = num_steps
        self.shared_conv = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.conv_cls = nn.Conv2d(c, a, 1, bias=False)
        self.conv_bbox = nn.Conv2d(c, 4 * a, 1, bias=False)

    def forward(self, feats, collect_rates: bool = False):
        """Returns (logits, bbox[, rates]). rates follows the reference's
        spike-rate forward (rpn.py:123-174): per level, per image, the mean
        over neurons of (sum over T of spikes) / T — here for the encoder and
        the spiking shared conv (the layers the energy analysis consumes)."""
        logits, bbox = [], []
        rates = {"encoder": [], "shared": []}
        for x in feats:
            v = torch.zeros_like(x)
            st = (torch.zeros_like(x), torch.zeros_like(x))
            li_o = li_b = None
            cnt_enc = torch.zeros(x.shape[0])
            cnt_shared = torch.zeros(x.shape[0])
            for _ in range(self.num_steps):
                z, v = lif_current_encoder(x, v)
                s, st = lif_step(self.shared_conv(z), st)
                co = self.conv_cls(s)
                cb = self.conv_bbox(s)
                if li_o is None:
                    li_o = (torch.zeros_like(co), torch.zeros_like(co))
                    li_b = (torch.zeros_like(cb), torch.zeros_like(cb))
                mo, li_o = li_step(co, li_o)
                mb, li_b = li_step(cb, li_b)
                if collect_rates:
                    cnt_enc += z.flatten(1).sum(1)
                    cnt_shared += s.flatten(1).sum(1)
            logits.append(mo)
            bbox.append(mb)
            if collect_rates:
                numel = x[0].numel()
                rates["encoder"].append(cnt_enc / (self.num_steps * numel))
                rates["shared"].append(cnt_shared / (self.num_steps * numel))
        if collect_rates:
            rates = {k: torch.stack(v) for k, v in rates.items()}  # [L, N]
            return logits, bbox, rates
        return logits, bbox


class BoxHeadSNNMirror(nn.Module):
    def __init__(self, cin=256 * 49, rep=1024, num_classes=9, num_steps=12,
                 only_one_bbox=False):
        super().__init__()
        self.num_steps = num_steps
        self.rep = rep
        self.fc6 = nn.Linear(cin, rep, bias=False)
        self.fc7 = nn.Linear(rep, rep, bias=False)
        self.cls_score = nn.Linear(rep, num_classes, bias=False)
        self.bbox_pred = nn.Linear(
            rep, 4 if only_one_bbox else num_classes * 4, bias=False
        )

    def forward(self, x, collect_rates: bool = False):
        """Returns (cls, bbox[, rates]); rates per RoI for encoder/fc6/fc7,
        the reference's convention (faster_rcnn.py:557-570)."""
        x = x.flatten(1)
        v = torch.zeros_like(x)
        st6 = st7 = li_c = li_b = None
        cnt_enc = torch.zeros(x.shape[0])
        cnt6 = torch.zeros(x.shape[0])
        cnt7 = torch.zeros(x.shape[0])
        for _ in range(self.num_steps):
            z, v = lif_current_encoder(x, v)
            c6 = self.fc6(z)
            if st6 is None:
                st6 = (torch.zeros_like(c6), torch.zeros_like(c6))
            s6, st6 = lif_step(c6, st6)
            c7 = self.fc7(s6)
            if st7 is None:
                st7 = (torch.zeros_like(c7), torch.zeros_like(c7))
            s7, st7 = lif_step(c7, st7)
            cc = self.cls_score(s7)
            cb = self.bbox_pred(s7)
            if li_c is None:
                li_c = (torch.zeros_like(cc), torch.zeros_like(cc))
                li_b = (torch.zeros_like(cb), torch.zeros_like(cb))
            mc, li_c = li_step(cc, li_c)
            mb, li_b = li_step(cb, li_b)
            if collect_rates:
                cnt_enc += z.sum(1)
                cnt6 += s6.sum(1)
                cnt7 += s7.sum(1)
        if collect_rates:
            rates = {
                "encoder": cnt_enc / (self.num_steps * x.shape[1]),
                "fc6": cnt6 / (self.num_steps * self.rep),
                "fc7": cnt7 / (self.num_steps * self.rep),
            }
            return mc, mb, rates
        return mc, mb


# ------------------------------------------------------------ detection ops


def anchors_for(shapes, image_size, sizes=None):
    """sizes: one entry per level; an entry may itself be a tuple (the
    mobilenet spec uses all 5 sizes at every level). Cell ordering is
    ratio-major × size-minor like torchvision's AnchorGenerator."""
    out = []
    sizes = sizes if sizes is not None else (32, 64, 128, 256, 512)
    ratios = (0.5, 1.0, 2.0)
    for (fh, fw), size in zip(shapes, sizes):
        sh, sw = image_size[0] // fh, image_size[1] // fw
        sz = np.atleast_1d(np.asarray(size, np.float64))
        hr = np.sqrt(ratios)
        ws = ((1 / hr)[:, None] * sz[None, :]).ravel()
        hs = (hr[:, None] * sz[None, :]).ravel()
        cell = np.stack([-ws, -hs, ws, hs], 1) / 2
        cell = cell.round()
        ys, xs = np.meshgrid(np.arange(fh) * sh, np.arange(fw) * sw, indexing="ij")
        shifts = np.stack([xs.ravel(), ys.ravel(), xs.ravel(), ys.ravel()], 1)
        a = (shifts[:, None] + cell[None]).reshape(-1, 4)
        out.append(torch.as_tensor(a, dtype=torch.float32))
    return out


def decode(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + w / 2
    cy = boxes[:, 1] + h / 2
    d = deltas.reshape(deltas.shape[0], -1, 4)
    dx, dy = d[..., 0] / wx, d[..., 1] / wy
    dw = torch.clamp(d[..., 2] / ww, max=math.log(1000 / 16))
    dh = torch.clamp(d[..., 3] / wh, max=math.log(1000 / 16))
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = torch.exp(dw) * w[:, None]
    ph = torch.exp(dh) * h[:, None]
    out = torch.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], -1)
    return out.reshape(deltas.shape[0], -1)


def nms(boxes, scores, thr):
    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    b = boxes[order]
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    suppressed = torch.zeros(len(b), dtype=torch.bool)
    for i in range(len(b)):
        if suppressed[i]:
            continue
        keep.append(order[i].item())
        ix = torch.clamp(
            torch.minimum(b[i, 2], b[i + 1:, 2]) - torch.maximum(b[i, 0], b[i + 1:, 0]),
            min=0,
        )
        iy = torch.clamp(
            torch.minimum(b[i, 3], b[i + 1:, 3]) - torch.maximum(b[i, 1], b[i + 1:, 1]),
            min=0,
        )
        inter = ix * iy
        iou = inter / (area[i] + area[i + 1:] - inter)
        suppressed[i + 1:] |= iou > thr
    return torch.as_tensor(keep, dtype=torch.long)


def batched_nms(boxes, scores, idxs, thr):
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    off = idxs.to(boxes.dtype) * (boxes.max() + 1)
    return nms(boxes + off[:, None], scores, thr)


def roi_align_ms(feats, boxes, image_size, out_size=7, sampling=2):
    """Multiscale RoIAlign (aligned=False), vectorized torch."""
    shapes = [(f.shape[-2], f.shape[-1]) for f in feats]
    scales = [2.0 ** round(math.log2(s[0] / image_size[0])) for s in shapes]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lvl = torch.floor(4 + torch.log2(torch.sqrt(area) / 224 + 1e-6))
    # LevelMapper bounds from the actual scales (resnet: 2..5; mobilenet:
    # both pooled maps are stride 32 -> 5..5, every RoI pools from "0").
    k_min = int(round(-math.log2(scales[0])))
    k_max = int(round(-math.log2(scales[-1])))
    lvl = torch.clamp(lvl, k_min, k_max).long() - k_min

    n_rois = boxes.shape[0]
    c = feats[0].shape[1]
    out = torch.zeros(n_rois, c, out_size, out_size)
    for li, (f, sc) in enumerate(zip(feats, scales)):
        sel = (lvl == li).nonzero(as_tuple=True)[0]
        if not len(sel):
            continue
        fh, fw = f.shape[-2:]
        fmap = f[0]  # single image
        b = boxes[sel] * sc
        rw = torch.clamp(b[:, 2] - b[:, 0], min=1.0)
        rh = torch.clamp(b[:, 3] - b[:, 1], min=1.0)
        bw = rw / out_size
        bh = rh / out_size
        acc = torch.zeros(len(sel), c, out_size, out_size)
        grid = torch.arange(out_size, dtype=torch.float32)
        for iy in range(sampling):
            for ix in range(sampling):
                y = b[:, 1, None] + (grid[None] + (iy + 0.5) / sampling) * bh[:, None]
                x = b[:, 0, None] + (grid[None] + (ix + 0.5) / sampling) * bw[:, None]
                yy = y[:, :, None].expand(-1, out_size, out_size)
                xx = x[:, None, :].expand(-1, out_size, out_size)
                valid = (yy >= -1) & (yy <= fh) & (xx >= -1) & (xx <= fw)
                ycl = yy.clamp(min=0)
                xcl = xx.clamp(min=0)
                y0 = ycl.long().clamp(max=fh - 1)
                x0 = xcl.long().clamp(max=fw - 1)
                y1 = (y0 + 1).clamp(max=fh - 1)
                x1 = (x0 + 1).clamp(max=fw - 1)
                ycl = torch.where(y0 >= fh - 1, y0.to(ycl.dtype), ycl)
                xcl = torch.where(x0 >= fw - 1, x0.to(xcl.dtype), xcl)
                ly = ycl - y0
                lx = xcl - x0
                hy, hx = 1 - ly, 1 - lx
                flat = fmap.reshape(c, -1)
                def g(yi, xi):
                    idx = (yi * fw + xi).reshape(-1)
                    return flat[:, idx].reshape(c, *yi.shape)
                val = (hy * hx) * g(y0, x0) + (hy * lx) * g(y0, x1) + \
                      (ly * hx) * g(y1, x0) + (ly * lx) * g(y1, x1)
                acc += (val * valid.to(val.dtype)).permute(1, 0, 2, 3)
        out[sel] = acc / (sampling * sampling)
    return out


# ------------------------------------------------------------ full model


class MirrorDetector(nn.Module):
    """Single-image eval pipeline matching the reference's SNN detector."""

    def __init__(self, num_classes=9, t_rpn=8, t_det=12, only_one_bbox=False,
                 mean=(0.2869, 0.3251, 0.2839), std=(0.1870, 0.1902, 0.1872),
                 backbone="resnet50"):
        super().__init__()
        self._mobile = backbone == "mobilenet"
        # mobilenet anchors: all 5 sizes x 3 ratios at each of the 3 levels
        # (reference faster_rcnn.py:726-735).
        self.anchor_sizes = (((32, 64, 128, 256, 512),) * 3 if self._mobile
                             else (32, 64, 128, 256, 512))
        self.backbone = MobileBackbone() if self._mobile else Backbone()
        self.rpn = nn.Module()
        self.rpn.head = RPNHeadSNNMirror(num_steps=t_rpn,
                                         a=15 if self._mobile else 3)
        self.roi_heads = nn.Module()
        self.roi_heads.box_head_and_predictor = BoxHeadSNNMirror(
            num_classes=num_classes, num_steps=t_det,
            only_one_bbox=only_one_bbox,
        )
        self.only_one_bbox = only_one_bbox
        self.mean = torch.tensor(mean).view(1, 3, 1, 1)
        self.std = torch.tensor(std).view(1, 3, 1, 1)
        self.pre_nms = 1000
        self.post_nms = 1000
        self.rpn_nms_thresh = 0.7
        self.score_thresh = 0.4
        self.box_nms_thresh = 0.5
        self.detections_per_img = 100

    @torch.no_grad()
    def forward(self, image: torch.Tensor, image_size: Tuple[int, int],
                collect_rates: bool = False):
        """image: [1, 3, H, W] float 0..1 (already resized+padded)."""
        x = (image - self.mean) / self.std
        feats = self.backbone(x)
        rpn_rates = det_rates = None
        if collect_rates:
            obj_maps, reg_maps, rpn_rates = self.rpn.head(
                feats, collect_rates=True
            )
        else:
            obj_maps, reg_maps = self.rpn.head(feats)

        shapes = [(f.shape[-2], f.shape[-1]) for f in feats]
        anchors = anchors_for(shapes, (image.shape[-2], image.shape[-1]),
                              sizes=self.anchor_sizes)

        all_boxes, all_scores, all_lvls = [], [], []
        for li, (o, r, a) in enumerate(zip(obj_maps, reg_maps, anchors)):
            # [1, A, H, W] -> (H, W, A) flatten to match anchor order
            aa = o.shape[1]
            obj = o[0].permute(1, 2, 0).reshape(-1)
            reg = r[0].reshape(aa, 4, *r.shape[-2:]).permute(2, 3, 0, 1).reshape(-1, 4)
            k = min(self.pre_nms, obj.shape[0])
            top = torch.topk(obj, k).indices
            props = decode(reg[top], a[top])
            all_boxes.append(props.reshape(-1, 4))
            all_scores.append(torch.sigmoid(obj[top]))
            all_lvls.append(torch.full((k,), li))
        boxes = torch.cat(all_boxes)
        scores = torch.cat(all_scores)
        lvls = torch.cat(all_lvls)
        pre_nms_proposals = boxes.clone()
        pre_nms_scores = scores.clone()

        h, w = image_size
        boxes[:, 0::2] = boxes[:, 0::2].clamp(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clamp(0, h)
        keep = ((boxes[:, 2] - boxes[:, 0]) >= 1e-3) & ((boxes[:, 3] - boxes[:, 1]) >= 1e-3)
        boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
        keep = batched_nms(boxes, scores, lvls, self.rpn_nms_thresh)[: self.post_nms]
        proposals = boxes[keep]

        pooled = roi_align_ms(feats[:-1], proposals,
                              (image.shape[-2], image.shape[-1]))
        if collect_rates:
            cls_logits, box_reg, det_rates = self.roi_heads.box_head_and_predictor(
                pooled, collect_rates=True
            )
        else:
            cls_logits, box_reg = self.roi_heads.box_head_and_predictor(pooled)

        pred = decode(box_reg, proposals, (10.0, 10.0, 5.0, 5.0)).reshape(
            len(proposals), -1, 4
        )
        if self.only_one_bbox:
            # Single regression slot broadcast across classes (PARITY.md;
            # reference roi_heads.py postprocess with a [R, 4] box tensor).
            pred = pred.expand(-1, cls_logits.shape[1], 4).contiguous()
        pred[..., 0::2] = pred[..., 0::2].clamp(0, w)
        pred[..., 1::2] = pred[..., 1::2].clamp(0, h)
        prob = F.softmax(cls_logits, -1)

        nc = prob.shape[1]
        fb = pred[:, 1:].reshape(-1, 4)
        fs = prob[:, 1:].reshape(-1)
        fl = torch.arange(1, nc).repeat(len(proposals))
        sel = fs > self.score_thresh
        fb, fs, fl = fb[sel], fs[sel], fl[sel]
        ok = ((fb[:, 2] - fb[:, 0]) >= 1e-2) & ((fb[:, 3] - fb[:, 1]) >= 1e-2)
        fb, fs, fl = fb[ok], fs[ok], fl[ok]
        keep = batched_nms(fb, fs, fl, self.box_nms_thresh)[: self.detections_per_img]
        out = {
            "boxes": fb[keep], "scores": fs[keep], "labels": fl[keep],
            "proposals": proposals, "all_scores": prob, "all_boxes": pred,
            "pre_nms_proposals": pre_nms_proposals,
            "pre_nms_scores": pre_nms_scores,
        }
        if collect_rates:
            out["rpn_rates"] = rpn_rates
            out["det_rates"] = det_rates
        return out
