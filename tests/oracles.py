"""Slow, obviously-correct numpy oracles for golden tests.

Each function is an independent re-derivation of the torchvision / norse
semantics the framework must reproduce — written scalar-style so bugs in the
vectorised JAX implementations don't propagate into the oracle.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------- boxes


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros((len(a), len(b)), np.float64)
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            ix1, iy1 = max(p[0], q[0]), max(p[1], q[1])
            ix2, iy2 = min(p[2], q[2]), min(p[3], q[3])
            iw, ih = max(ix2 - ix1, 0.0), max(iy2 - iy1, 0.0)
            inter = iw * ih
            ua = (p[2] - p[0]) * (p[3] - p[1]) + (q[2] - q[0]) * (q[3] - q[1]) - inter
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def encode(ref: np.ndarray, prop: np.ndarray, weights) -> np.ndarray:
    wx, wy, ww, wh = weights
    out = np.zeros_like(ref, np.float64)
    for k in range(len(ref)):
        ew, eh = prop[k, 2] - prop[k, 0], prop[k, 3] - prop[k, 1]
        ecx, ecy = prop[k, 0] + ew / 2, prop[k, 1] + eh / 2
        gw, gh = ref[k, 2] - ref[k, 0], ref[k, 3] - ref[k, 1]
        gcx, gcy = ref[k, 0] + gw / 2, ref[k, 1] + gh / 2
        out[k] = [wx * (gcx - ecx) / ew, wy * (gcy - ecy) / eh,
                  ww * math.log(gw / ew), wh * math.log(gh / eh)]
    return out


def decode(deltas: np.ndarray, boxes: np.ndarray, weights) -> np.ndarray:
    wx, wy, ww, wh = weights
    clip = math.log(1000.0 / 16)
    out = np.zeros_like(deltas, np.float64)
    d = deltas.reshape(len(boxes), -1, 4)
    o = out.reshape(len(boxes), -1, 4)
    for k in range(len(boxes)):
        w, h = boxes[k, 2] - boxes[k, 0], boxes[k, 3] - boxes[k, 1]
        cx, cy = boxes[k, 0] + w / 2, boxes[k, 1] + h / 2
        for c in range(d.shape[1]):
            dx, dy = d[k, c, 0] / wx, d[k, c, 1] / wy
            dw, dh = min(d[k, c, 2] / ww, clip), min(d[k, c, 3] / wh, clip)
            pcx, pcy = dx * w + cx, dy * h + cy
            pw, ph = math.exp(dw) * w, math.exp(dh) * h
            o[k, c] = [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2]
    return out


# ---------------------------------------------------------------- nms


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thr: float,
               groups: np.ndarray | None = None) -> list[int]:
    """torchvision nms/batched_nms: greedy by descending score, suppress
    same-group boxes with IoU strictly greater than thr. Returns kept indices
    in score order."""
    order = list(np.argsort(-scores, kind="stable"))
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = iou_matrix(boxes, boxes)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order[pos + 1:]:
            if suppressed[j]:
                continue
            if groups is not None and groups[i] != groups[j]:
                continue
            if iou[i, j] > thr:
                suppressed[j] = True
    return keep


# ---------------------------------------------------------------- matcher


def match(quality: np.ndarray, high: float, low: float, allow_low: bool) -> np.ndarray:
    """torchvision Matcher.__call__ scalar re-derivation. quality: [G, N]."""
    g, n = quality.shape
    matches = quality.argmax(axis=0)
    vals = quality.max(axis=0)
    all_matches = matches.copy()
    out = matches.astype(np.int64)
    out[vals < low] = -1
    out[(vals >= low) & (vals < high)] = -2
    if allow_low:
        highest = quality.max(axis=1)
        for gi in range(g):
            for ni in range(n):
                if quality[gi, ni] == highest[gi]:
                    out[ni] = all_matches[ni]
    return out


# ---------------------------------------------------------------- roi align


def roi_align_single(feat: np.ndarray, roi: np.ndarray, scale: float,
                     out_size: int = 7, sampling: int = 2) -> np.ndarray:
    """torchvision roi_align (aligned=False) for one roi. feat: [H, W, C]."""
    h, w, c = feat.shape

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= h - 1:
            y_high = y_low = h - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= w - 1:
            x_high = x_low = w - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
                + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])

    x1, y1, x2, y2 = roi * scale
    rw = max(x2 - x1, 1.0)
    rh = max(y2 - y1, 1.0)
    bw, bh = rw / out_size, rh / out_size
    out = np.zeros((out_size, out_size, c))
    for ph in range(out_size):
        for pw_ in range(out_size):
            acc = np.zeros(c)
            for iy in range(sampling):
                for ix in range(sampling):
                    y = y1 + ph * bh + (iy + 0.5) * bh / sampling
                    x = x1 + pw_ * bw + (ix + 0.5) * bw / sampling
                    acc += bilinear(y, x)
            out[ph, pw_] = acc / (sampling * sampling)
    return out


# ---------------------------------------------------------------- norse LIF


def lif_encoder_steps(x: np.ndarray, steps: int, v_th: float = 0.25,
                      dt: float = 1e-3, tau_mem_inv: float = 100.0):
    """norse lif_current_encoder unrolled; returns list of spike arrays."""
    v = np.zeros_like(x)
    zs = []
    for _ in range(steps):
        v = v + dt * tau_mem_inv * (-v + x)
        z = (v > v_th).astype(x.dtype)
        v = v - z * v
        zs.append(z)
    return zs


def lif_cell_steps(currents: list[np.ndarray], v_th: float = 0.1,
                   dt: float = 1e-3, tau_mem_inv: float = 100.0,
                   tau_syn_inv: float = 200.0):
    """norse feed-forward LIFCell unrolled over a list of input currents."""
    v = np.zeros_like(currents[0])
    i = np.zeros_like(currents[0])
    zs = []
    for cur in currents:
        v_dec = v + dt * tau_mem_inv * (-v + i)
        i_dec = i - dt * tau_syn_inv * i
        z = (v_dec > v_th).astype(cur.dtype)
        v = (1 - z) * v_dec
        i = i_dec + cur
        zs.append(z)
    return zs


def li_cell_steps(currents: list[np.ndarray], dt: float = 1e-3,
                  tau_mem_inv: float = 100.0, tau_syn_inv: float = 200.0):
    """norse feed-forward LICell unrolled; returns list of membrane outputs."""
    v = np.zeros_like(currents[0])
    i = np.zeros_like(currents[0])
    vs = []
    for cur in currents:
        i_jump = i + cur
        v = v + dt * tau_mem_inv * (-v + i_jump)
        i = i_jump - dt * tau_syn_inv * i_jump
        vs.append(v.copy())
    return vs
