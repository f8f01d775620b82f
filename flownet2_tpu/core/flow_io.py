"""Flow/image file formats: Middlebury ``.flo``, PFM, PPM/PGM.

Format contracts match the reference framework's I/O layer
(reference: src/caffe/util/output.cpp:16-66 for .flo; scripts/run-flownet.py:100-126
for the CLI-side writer; tools/convert_imageset_and_flow.cpp for PFM use).
All arrays here are channels-last (H, W, C) float32/uint8 — the TPU-native layout —
unlike the reference's NCHW blobs.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Tuple

import numpy as np

# Middlebury sanity-check magic: the float 202021.25 reads as "PIEH" in ASCII
# (reference: src/caffe/util/output.cpp:52 writes the literal bytes "PIEH").
FLO_MAGIC_BYTES = b"PIEH"
FLO_MAGIC_FLOAT = 202021.25


def read_flo(path: str | os.PathLike) -> np.ndarray:
    """Read a ``.flo`` file → float32 array of shape (H, W, 2), channels (u, v).

    Layout on disk: 4-byte magic, int32 width, int32 height, then row-major
    interleaved (u, v) float32 pairs (reference: src/caffe/util/output.cpp:16-45).
    """
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != FLO_MAGIC_BYTES:
            raise ValueError(f"{path}: bad .flo magic {magic!r} (expected {FLO_MAGIC_BYTES!r})")
        (width,) = struct.unpack("<i", f.read(4))
        (height,) = struct.unpack("<i", f.read(4))
        if width <= 0 or height <= 0 or width * height > 10**8:
            raise ValueError(f"{path}: implausible .flo dims {width}x{height}")
        data = np.fromfile(f, dtype="<f4", count=width * height * 2)
    if data.size != width * height * 2:
        raise ValueError(f"{path}: truncated .flo payload")
    return data.reshape(height, width, 2)


def write_flo(path: str | os.PathLike, flow: np.ndarray) -> None:
    """Write (H, W, 2) float32 flow as ``.flo``.

    Byte-compatible with the reference writers (src/caffe/util/output.cpp:47-66,
    scripts/run-flownet.py:117-126): magic, w, h, interleaved row-major (u, v).
    """
    flow = np.asarray(flow)
    if flow.ndim != 3 or flow.shape[-1] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(FLO_MAGIC_BYTES)
        f.write(struct.pack("<ii", w, h))
        flow.astype("<f4", copy=False).tofile(f)


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm). The reference reads inputs with OpenCV/misc.imread and
# writes P6/P5 directly (src/caffe/util/output.cpp:67-96, imgwriter_layer.cpp).
# ---------------------------------------------------------------------------

_PNM_HEADER_RE = re.compile(rb"^(P[456])")


def _read_pnm_token(f) -> bytes:
    """Read one whitespace-delimited token, skipping '#' comment lines."""
    tok = b""
    while True:
        c = f.read(1)
        if not c:
            raise ValueError("unexpected EOF in PNM header")
        if c == b"#":
            f.readline()
            continue
        if c.isspace():
            if tok:
                return tok
            continue
        tok += c


def read_ppm(path: str | os.PathLike) -> np.ndarray:
    """Read binary PPM (P6) / PGM (P5) → uint8 (H, W, 3) or (H, W, 1)."""
    with open(path, "rb") as f:
        magic = f.read(2)
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"{path}: unsupported PNM magic {magic!r}")
        width = int(_read_pnm_token(f))
        height = int(_read_pnm_token(f))
        maxval = int(_read_pnm_token(f))
        channels = 3 if magic == b"P6" else 1
        dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
        data = np.fromfile(f, dtype=dtype, count=width * height * channels)
    if data.size != width * height * channels:
        raise ValueError(f"{path}: truncated PNM payload")
    return data.reshape(height, width, channels)


def write_ppm(path: str | os.PathLike, img: np.ndarray) -> None:
    """Write uint8 (H, W, 3) as P6 or (H, W[, 1]) as P5."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n255\n" % (w, h))
        np.clip(img, 0, 255).astype(np.uint8).tofile(f)


# ---------------------------------------------------------------------------
# PFM — used by the reference for disparity data and the PFMWriter layer
# (tools/convert_imageset_and_disparity.cpp, pfmwriter_layer.cpp).
# Scanlines are stored bottom-to-top; scale sign encodes endianness.
# ---------------------------------------------------------------------------


def read_pfm(path: str | os.PathLike) -> Tuple[np.ndarray, float]:
    """Read PFM → (float32 (H, W, C) with row 0 at the top, |scale|)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic == b"PF":
            channels = 3
        elif magic == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file (magic {magic!r})")
        dims = f.readline().strip().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, dtype=endian + "f4", count=width * height * channels)
    if data.size != width * height * channels:
        raise ValueError(f"{path}: truncated PFM payload")
    img = data.reshape(height, width, channels)
    return np.ascontiguousarray(img[::-1]), abs(scale)


def write_pfm(path: str | os.PathLike, img: np.ndarray, scale: float = 1.0) -> None:
    """Write float32 (H, W[, C]) as PFM (little-endian, bottom-to-top rows)."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"PFM supports 1 or 3 channels, got {c}")
    with open(path, "wb") as f:
        f.write(b"PF\n" if c == 3 else b"Pf\n")
        f.write(b"%d %d\n" % (w, h))
        f.write(b"%f\n" % -abs(scale))
        img[::-1].astype("<f4").tofile(f)


def read_image(path: str | os.PathLike) -> np.ndarray:
    """Read an image file → uint8 (H, W, 3) RGB.

    Handles PPM/PGM natively; PNG/JPEG via PIL if available. This backs the
    CLI's image loading (reference: scripts/run-flownet.py:30-35 uses
    misc.imread). Grayscale is broadcast to 3 channels like the reference's
    ``if len(img0.shape) < 3`` path.
    """
    path = os.fspath(path)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".ppm", ".pgm", ".pnm"):
        img = read_ppm(path)
    else:
        try:
            from PIL import Image  # pillow is an optional decode path

            img = np.asarray(Image.open(path).convert("RGB"))
        except ImportError as e:  # pragma: no cover - depends on env
            raise RuntimeError(
                f"cannot decode {ext} without PIL; convert to .ppm first"
            ) from e
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img
