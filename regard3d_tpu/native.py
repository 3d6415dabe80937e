"""ctypes bindings to the native host-runtime library (native/).

Builds ``libr3d_native.so`` on first use (g++, no external deps) and falls
back to pure-NumPy implementations when a compiler is unavailable — the
Python paths stay the reference semantics; native is the fast path for
city-scale host work (1DSfM-class match graphs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libr3d_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "r3d_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.r3d_union_find.restype = ctypes.c_int64
        lib.r3d_union_find.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.r3d_parse_feats.restype = ctypes.c_int64
        lib.r3d_parse_feats.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.r3d_mser.restype = ctypes.c_int64
        lib.r3d_mser.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.r3d_tbmr.restype = ctypes.c_int64
        lib.r3d_tbmr.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        lib.r3d_native_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def union_find(edges: np.ndarray, num_nodes: int) -> Optional[np.ndarray]:
    """Connected-component labels for an (E, 2) int64 edge list, or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, np.int64)
    labels = np.empty(num_nodes, np.int64)
    n = lib.r3d_union_find(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(edges), num_nodes,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        return None
    return labels


def mser(img_u8: np.ndarray, delta: int = 5, min_area: int = 60,
         max_area: int = 14400, max_variation: float = 0.25,
         min_diversity: float = 0.2,
         max_out: int = 1 << 16) -> Optional[np.ndarray]:
    """MSER keypoints over both polarities (cv::MSER::create() default
    parameters, src/Regard3DFeatures.cpp:652-662).  img_u8: (H, W) uint8.
    Returns (N, 4) float32 rows (cx, cy, kp_size, area), or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape
    out = np.empty((max_out, 4), np.float32)
    n = lib.r3d_mser(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        delta, min_area, max_area, max_variation, min_diversity,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
    if n < 0:
        return None
    return out[:n].copy()


def tbmr(img_u8: np.ndarray, minimum_size: int = 30,
         maximum_relative_area: float = 0.01, both_polarities: bool = True,
         max_out: int = 1 << 16) -> Optional[np.ndarray]:
    """TBMR affine regions (OpenMVG features::tbmr::Extract_tbmr parity,
    src/Regard3DFeatures.cpp:630; minimumSize=30, maximumRelativeArea=0.01).
    img_u8: (H, W) uint8.  Returns (N, 6) float32 rows
    (x, y, l1, l2, orientation_rad, area), or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape
    out = np.empty((max_out, 6), np.float32)
    n = lib.r3d_tbmr(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        minimum_size, maximum_relative_area,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
    if n < 0:
        return None
    rows = [out[:n].copy()]
    if both_polarities and n >= 0:
        inv = np.ascontiguousarray(255 - img_u8)
        out2 = np.empty((max_out, 6), np.float32)
        n2 = lib.r3d_tbmr(
            inv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            minimum_size, maximum_relative_area,
            out2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
        if n2 > 0:
            rows.append(out2[:n2].copy())
    return np.concatenate(rows, 0)


def parse_feats(path: str, max_rows: int = 1 << 20) -> Optional[np.ndarray]:
    """Parse a .feat text file -> (N, 4) float32, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max_rows, 4), np.float32)
    n = lib.r3d_parse_feats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows)
    if n < 0:
        return None
    return out[:n].copy()
