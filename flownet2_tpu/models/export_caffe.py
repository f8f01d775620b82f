"""Export param pytrees as reference-format ``.caffemodel`` binaryprotos.

The inverse of :mod:`flownet2_tpu.models.import_caffe`: encodes a
NetParameter with one Convolution/Deconvolution layer per param entry
(weights converted back to the reference's OIHW / (bottom,top,kh,kw)
layouts), so weights move both directions between the frameworks. Uses the
same clean-room wire encoding as the importer's tests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wtype: int) -> bytes:
    return _varint((fnum << 3) | wtype)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _encode_blob(arr: np.ndarray) -> bytes:
    shape_payload = b"".join(_tag(1, 0) + _varint(int(d)) for d in arr.shape)
    return _len_field(7, shape_payload) + _len_field(5, arr.astype("<f4").tobytes())


def _is_deconv(name: str, w: np.ndarray) -> bool:
    return name.startswith(("deconv", "upsample_flow")) and w.ndim == 4


def export_caffemodel(
    params: dict,
    path: Optional[str] = None,
    *,
    net_name: str = "flownet2-tpu-export",
    bgr_slots: Optional[dict[str, int]] = None,
) -> bytes:
    """Encode a flat {layer: {"w","b"}} param dict (one subnet) as a
    binaryproto NetParameter; optionally write to ``path``.

    ``bgr_slots`` reverses the importer's RGB→BGR input-channel flips for
    input-facing layers so exported weights drop into a BGR-fed reference
    deploy unchanged.
    """
    bgr_slots = bgr_slots or {}
    body = _len_field(1, net_name.encode())
    for name, p in params.items():
        w = np.asarray(p["w"], np.float32)
        if w.ndim == 4:
            if _is_deconv(name, w):
                # (kh, kw, Cout, Cin) → caffe deconv (bottom=Cin, top=Cout, kh, kw)
                blob = np.transpose(w, (3, 2, 0, 1))
                ltype = "Deconvolution"
            else:
                # HWIO → OIHW
                blob = np.transpose(w, (3, 2, 0, 1))
                ltype = "Convolution"
            slots = bgr_slots.get(name, 0)
            if slots:
                blob = blob.copy()
                for s in range(slots):
                    sl = slice(3 * s, 3 * s + 3)
                    blob[:, sl] = blob[:, sl][:, ::-1]
        else:
            blob = w
            ltype = "InnerProduct"
        layer = _len_field(1, name.encode()) + _len_field(2, ltype.encode())
        layer += _len_field(7, _encode_blob(blob))
        if "b" in p:
            layer += _len_field(7, _encode_blob(np.asarray(p["b"], np.float32)))
        body += _len_field(100, layer)
    if path is not None:
        with open(path, "wb") as f:
            f.write(body)
    return body
