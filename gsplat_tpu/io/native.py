"""ctypes bindings for the native host runtime (``native/gsplat_io.cpp``).

Builds the shared library on first use (g++, cached next to the source) and
falls back to pure numpy when no compiler is available.  Covers: parallel
PLY column extraction with fused 3DGS activations, radix argsort, and Morton
spatial reordering.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

log = get_logger("io.native")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    src = os.path.abspath(os.path.join(src_dir, "gsplat_io.cpp"))
    so = os.path.abspath(os.path.join(src_dir, "libgsplat_io.so"))
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so, src, "-lpthread"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
    except Exception as e:  # no compiler / build failure → numpy fallback
        log.warning_once(f"native IO unavailable ({type(e).__name__}: {e}) — numpy fallback")
        return None

    lib.extract_columns_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.activate_splats.argtypes = [ctypes.c_void_p] * 12 + [ctypes.c_int64]
    lib.radix_argsort_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.morton_codes.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64, ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build_and_load()
            _tried = True
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def extract_columns(raw: bytes, n: int, stride: int, offsets, names=None) -> list:
    """Extract float32 columns from packed binary records (SoA)."""
    lib = get_lib()
    outs = [np.empty(n, np.float32) for _ in offsets]
    if lib is None:
        # numpy fallback: strided record view
        rec = np.frombuffer(raw, np.uint8, count=n * stride).reshape(n, stride)
        for j, off in enumerate(offsets):
            outs[j][:] = rec[:, off : off + 4].copy().view(np.float32).reshape(n)
        return outs
    offs = (ctypes.c_int64 * len(offsets))(*offsets)
    ptrs = (ctypes.c_void_p * len(outs))(*[o.ctypes.data for o in outs])
    base = (ctypes.c_char * len(raw)).from_buffer_copy(raw)
    lib.extract_columns_f32(
        ctypes.cast(base, ctypes.c_void_p), n, stride, offs, len(offsets), ptrs
    )
    return outs


def activate_splats_inplace(opacity, scale3, rot4):
    """Fused sigmoid/exp/quat-normalize.  ``scale3``: 3 arrays; ``rot4``: 4
    raw PLY rot arrays (w,x,y,z).  Returns (opacity, scale3, orient_xyzw)."""
    n = opacity.shape[0]
    lib = get_lib()
    qx = np.empty(n, np.float32)
    qy = np.empty(n, np.float32)
    qz = np.empty(n, np.float32)
    qw = np.empty(n, np.float32)
    if lib is None:
        opacity[:] = 1.0 / (1.0 + np.exp(-opacity))
        for s in scale3:
            np.exp(s, out=s)
        w, x, y, z = rot4
        inv = 1.0 / np.maximum(np.sqrt(w * w + x * x + y * y + z * z), 1e-12)
        qx[:], qy[:], qz[:], qw[:] = x * inv, y * inv, z * inv, w * inv
        return opacity, scale3, (qx, qy, qz, qw)
    lib.activate_splats(
        _ptr(opacity), _ptr(scale3[0]), _ptr(scale3[1]), _ptr(scale3[2]),
        _ptr(rot4[0]), _ptr(rot4[1]), _ptr(rot4[2]), _ptr(rot4[3]),
        _ptr(qx), _ptr(qy), _ptr(qz), _ptr(qw), n,
    )
    return opacity, scale3, (qx, qy, qz, qw)


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Ascending argsort of float32 keys (native radix; numpy fallback)."""
    keys = np.ascontiguousarray(keys, np.float32)
    lib = get_lib()
    if lib is None:
        return np.argsort(keys, kind="stable").astype(np.int32)
    out = np.empty(keys.shape[0], np.int32)
    lib.radix_argsort_f32(_ptr(keys), keys.shape[0], _ptr(out))
    return out


def morton_order(pos_soa: np.ndarray) -> np.ndarray:
    """Spatial (Z-order) permutation of splats from (3, N) positions.
    Reordering splats by locality improves device-side tile/pair coherence."""
    x = np.ascontiguousarray(pos_soa[0], np.float32)
    y = np.ascontiguousarray(pos_soa[1], np.float32)
    z = np.ascontiguousarray(pos_soa[2], np.float32)
    n = x.shape[0]
    lib = get_lib()
    codes = np.empty(n, np.uint64)
    if lib is None:
        # coarse numpy fallback: interleave quantized bits via int64 keys
        def q(a):
            lo, hi = a.min(), a.max()
            return ((a - lo) / max(hi - lo, 1e-12) * 2097151).astype(np.uint64)

        cx, cy, cz = q(x), q(y), q(z)

        def expand(v):
            v &= np.uint64(0x1FFFFF)
            v = (v | v << np.uint64(32)) & np.uint64(0x1F00000000FFFF)
            v = (v | v << np.uint64(16)) & np.uint64(0x1F0000FF0000FF)
            v = (v | v << np.uint64(8)) & np.uint64(0x100F00F00F00F00F)
            v = (v | v << np.uint64(4)) & np.uint64(0x10C30C30C30C30C3)
            v = (v | v << np.uint64(2)) & np.uint64(0x1249249249249249)
            return v

        codes = (expand(cx) << np.uint64(2)) | (expand(cy) << np.uint64(1)) | expand(cz)
    else:
        lib.morton_codes(_ptr(x), _ptr(y), _ptr(z), n, _ptr(codes))
    return np.argsort(codes).astype(np.int32)
