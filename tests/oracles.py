"""Pure-numpy loop oracles for every custom op.

These are direct, slow transliterations of the mathematical specs in
SURVEY.md §2.2 (themselves derived from the reference CUDA kernels), kept
deliberately naive so they can serve as independent ground truth for the
vectorized JAX/Pallas implementations — the role the reference's CPU layer
paths played for its GPU kernels (e.g. flow_warp_layer.cpp:58-117).
"""

from __future__ import annotations

import math

import numpy as np


def correlation_oracle(
    f1: np.ndarray,
    f2: np.ndarray,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
    multiply: bool = True,
) -> np.ndarray:
    """NHWC correlation, looped. Spec: correlation_layer.cu:46-114,252-290."""
    n, h, w, c = f1.shape
    kr = (kernel_size - 1) // 2
    md = max_displacement
    border = md + kr
    out_h = math.ceil((h + 2 * pad - 2 * border) / stride1)
    out_w = math.ceil((w + 2 * pad - 2 * border) / stride1)
    gr = md // stride2
    gw = 2 * gr + 1

    f1p = np.pad(f1, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    f2p = np.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((n, out_h, out_w, gw * gw), dtype=np.float64)
    norm = kernel_size * kernel_size * c

    for b in range(n):
        for y in range(out_h):
            for x in range(out_w):
                y1 = y * stride1 + md
                x1 = x * stride1 + md
                for d in range(gw * gw):
                    dy = (d // gw - gr) * stride2
                    dx = (d % gw - gr) * stride2
                    acc = 0.0
                    for j in range(kernel_size):
                        for i in range(kernel_size):
                            a = f1p[b, y1 + j, x1 + i, :]
                            bb = f2p[b, y1 + dy + j, x1 + dx + i, :]
                            if multiply:
                                acc += float(np.dot(a, bb))
                            else:
                                acc += float(np.sum(np.abs(a - bb)))
                    out[b, y, x, d] = acc / norm
    return out.astype(np.float32)


def correlation_1d_oracle(
    f1: np.ndarray,
    f2: np.ndarray,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
    single_direction: int = 0,
    multiply: bool = True,
) -> np.ndarray:
    """Spec: correlation_layer1d.{cpp:43-92,cu:48-110}."""
    n, h, w, c = f1.shape
    kr = (kernel_size - 1) // 2
    md = max_displacement
    border = md + kr
    out_w = math.ceil((w + 2 * pad - 2 * border) / stride1)
    out_h = math.ceil((h - 2 * kr) / stride1)
    gr = md // stride2
    if single_direction != 0:
        gw = gr + 1
        x_shift = -gr if single_direction < 0 else 0
    else:
        gw = 2 * gr + 1
        x_shift = -gr

    f1p = np.pad(f1, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    f2p = np.pad(f2, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    out = np.zeros((n, out_h, out_w, gw), dtype=np.float64)
    norm = kernel_size * kernel_size * c

    for b in range(n):
        for y in range(out_h):
            for x in range(out_w):
                y1 = y * stride1
                x1 = x * stride1 + md
                for d in range(gw):
                    dx = (d + x_shift) * stride2
                    acc = 0.0
                    for j in range(kernel_size):
                        for i in range(kernel_size):
                            a = f1p[b, y1 + j, x1 + i, :]
                            bb = f2p[b, y1 + j, x1 + dx + i, :]
                            if multiply:
                                acc += float(np.dot(a, bb))
                            else:
                                acc += float(np.sum(np.abs(a - bb)))
                    out[b, y, x, d] = acc / norm
    return out.astype(np.float32)


def flow_warp_oracle(image: np.ndarray, flow: np.ndarray, fill_value: float = 0.0) -> np.ndarray:
    """Spec: flow_warp_layer.cpp:58-117 (NHWC here)."""
    n, h, w, c = image.shape
    out = np.empty_like(image, dtype=np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx = flow[b, y, x, 0]
                fy = flow[b, y, x, 1]
                x2 = x + fx
                y2 = y + fy
                if 0 <= x2 < w and 0 <= y2 < h:
                    xl = int(x2)
                    yt = int(y2)
                    xr = min(xl + 1, w - 1)
                    yb = min(yt + 1, h - 1)
                    a = x2 - xl
                    bta = y2 - yt
                    out[b, y, x, :] = (
                        (1 - a) * (1 - bta) * image[b, yt, xl]
                        + a * (1 - bta) * image[b, yt, xr]
                        + (1 - a) * bta * image[b, yb, xl]
                        + a * bta * image[b, yb, xr]
                    )
                else:
                    out[b, y, x, :] = fill_value
    return out


def resample_oracle(
    x: np.ndarray,
    out_h: int,
    out_w: int,
    method: str = "linear",
    antialias: bool = True,
) -> np.ndarray:
    """Spec: resample_layer.cu:39-125 (incl. the swapped fx/fy half offsets)."""

    def bicubic(v):
        v = abs(v)
        if v <= 1.0:
            return v * v * (1.5 * v - 2.5) + 1.0
        if v < 2.0:
            return v * (v * (-0.5 * v + 2.5) - 4.0) + 2.0
        return 0.0

    def triangle(v):
        if -1 <= v < 0:
            return v + 1
        if 0 <= v <= 1:
            return 1 - v
        return 0.0

    def c_round(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    h, w, c = x.shape
    fx = w / out_w
    fy = h / out_h
    out = np.zeros((out_h, out_w, c), dtype=np.float32)

    if method == "nearest":
        for yo in range(out_h):
            for xo in range(out_w):
                x_in = xo * fx + fy / 2.0 - 0.5
                y_in = yo * fy + fx / 2.0 - 0.5
                xi = min(max(c_round(x_in), 0), w - 1)
                yi = min(max(c_round(y_in), 0), h - 1)
                out[yo, xo] = x[yi, xi]
        return out

    coeff = bicubic if method == "cubic" else triangle
    kernel_width = 4 if method == "cubic" else 2
    is_down = fx > 1 or fy > 1
    aa = antialias and is_down
    ax = 1.0 / fx if aa else 1.0
    ay = 1.0 / fy if aa else 1.0
    rx = 2 if fx < 1.0 else int(math.ceil(kernel_width / ax))
    ry = 2 if fy < 1.0 else int(math.ceil(kernel_width / ay))

    for yo in range(out_h):
        for xo in range(out_w):
            x_in = xo * fx + fy / 2.0 - 0.5
            y_in = yo * fy + fx / 2.0 - 0.5
            xr_ = c_round(x_in)
            yr_ = c_round(y_in)
            s = np.zeros(c)
            ws = 0.0
            for yy in range(yr_ - ry, yr_ + ry + 1):
                for xx in range(xr_ - rx, xr_ + rx + 1):
                    if yy < 0 or xx < 0 or yy >= h or xx >= w:
                        continue
                    wgt = ax * coeff(ax * (x_in - xx)) * ay * coeff(ay * (y_in - yy))
                    s += wgt * x[yy, xx]
                    ws += wgt
            out[yo, xo] = 0.0 if ws == 0 else s / ws
    return out


def downsample_oracle(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Spec: downsample_layer.cu:15-72 (NaN voting, align-corners)."""
    h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x.copy()
    ws_ = (w - 1) / (out_w - 1)
    hs_ = (h - 1) / (out_h - 1)
    wr = int(math.ceil(ws_))
    hr = int(math.ceil(hs_))
    out = np.zeros((out_h, out_w, c), dtype=np.float32)
    for ch in range(c):
        for yo in range(out_h):
            for xo in range(out_w):
                bx = xo / (out_w - 1) * (w - 1)
                by = yo / (out_h - 1) * (h - 1)
                ibx = int(math.floor(bx + 0.5))  # C round(), bx >= 0
                iby = int(math.floor(by + 0.5))
                av = aw = an = 0.0
                for yoff in range(-hr, hr + 1):
                    for xoff in range(-wr, wr + 1):
                        xx = ibx + xoff
                        yy = iby + yoff
                        if 0 <= xx < w and 0 <= yy < h:
                            sample = x[yy, xx, ch]
                            wgt = max(0.0, 1.0 - abs(xx - bx) / ws_) * max(
                                0.0, 1.0 - abs(yy - by) / hs_
                            )
                            if np.isnan(sample):
                                an += wgt
                                sample = 0.0
                                wgt = 0.0
                            av += sample * wgt
                            aw += wgt
                if aw == 0 or an / aw > 0.5:
                    out[yo, xo, ch] = np.nan
                else:
                    out[yo, xo, ch] = av / aw
    return out
