"""ctypes bindings for the native data-path library (cpp/flowdata.cc).

Loads ``libflowdata.so``, building it with g++ on first use if absent.
Every entry point has a numpy fallback (the implementations in
flownet2_tpu.core.codec / core.flow_io), so the package works without a
compiler; tests assert native/numpy agreement when the library builds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libflowdata.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CPP_DIR, "flowdata.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.fd_decode_flow_i16.argtypes = [i16p, f32p, i64]
        lib.fd_encode_flow_i16.argtypes = [f32p, i16p, i64]
        lib.fd_unpack_bits.argtypes = [u8p, f32p, i64]
        lib.fd_decode_pnm.argtypes = [u8p, i64, u8p, i64, i32p, i32p, i32p]
        lib.fd_decode_pnm.restype = ctypes.c_int
        lib.fd_read_flo.argtypes = [u8p, i64, f32p, i64, i32p, i32p]
        lib.fd_read_flo.restype = ctypes.c_int
        lib.fd_decode_record.argtypes = [u8p, i64, f32p, f32p, f32p, f32p, i32p, i32p, i32p, i32p]
        lib.fd_decode_record.restype = ctypes.c_int
        lib.fd_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_flow_i16(data: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.int16)
    out = np.empty(data.shape, np.float32)
    lib.fd_decode_flow_i16(_as_ptr(data, ctypes.c_int16), _as_ptr(out, ctypes.c_float), data.size)
    return out


def encode_flow_i16(flow: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flow = np.ascontiguousarray(flow, np.float32)
    out = np.empty(flow.shape, np.int16)
    lib.fd_encode_flow_i16(_as_ptr(flow, ctypes.c_float), _as_ptr(out, ctypes.c_int16), flow.size)
    return out


def decode_pnm(buf: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(buf, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.fd_decode_pnm(
        _as_ptr(raw, ctypes.c_uint8), raw.size, None, 0,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
    )
    if rc != 0:
        raise ValueError(f"fd_decode_pnm header failed: {rc}")
    out = np.empty((h.value, w.value, ch.value), np.uint8)
    rc = lib.fd_decode_pnm(
        _as_ptr(raw, ctypes.c_uint8), raw.size, _as_ptr(out, ctypes.c_uint8),
        out.size, ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
    )
    if rc != 0:
        raise ValueError(f"fd_decode_pnm payload failed: {rc}")
    return out


def read_flo(buf: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(buf, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.fd_read_flo(_as_ptr(raw, ctypes.c_uint8), raw.size, None, 0, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"fd_read_flo header failed: {rc}")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.fd_read_flo(
        _as_ptr(raw, ctypes.c_uint8), raw.size, _as_ptr(out, ctypes.c_float),
        out.size, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"fd_read_flo payload failed: {rc}")
    return out


def decode_record(body: bytes) -> Optional[dict]:
    """Decode one .flowrec body → dict of float32 HWC arrays, or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(body, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    has_occ = ctypes.c_int32()
    flow_ch = ctypes.c_int32()
    rc = lib.fd_decode_record(
        _as_ptr(raw, ctypes.c_uint8), raw.size, None, None, None, None,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(has_occ), ctypes.byref(flow_ch),
    )
    if rc != 0:
        raise ValueError(f"fd_decode_record header failed: {rc}")
    H, W = h.value, w.value
    img0 = np.empty((H, W, 3), np.float32)
    img1 = np.empty((H, W, 3), np.float32)
    flow = np.empty((H, W, flow_ch.value), np.float32)
    occ = np.empty((H, W), np.float32) if has_occ.value else np.empty((0,), np.float32)
    rc = lib.fd_decode_record(
        _as_ptr(raw, ctypes.c_uint8), raw.size,
        _as_ptr(img0, ctypes.c_float), _as_ptr(img1, ctypes.c_float),
        _as_ptr(flow, ctypes.c_float),
        _as_ptr(occ, ctypes.c_float) if has_occ.value else None,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(has_occ), ctypes.byref(flow_ch),
    )
    if rc != 0:
        raise ValueError(f"fd_decode_record payload failed: {rc}")
    out = {"img0": img0, "img1": img1, "flow": flow}
    if has_occ.value:
        out["occ"] = occ[..., None]
    return out
