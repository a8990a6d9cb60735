"""ctypes loader for the native C++ runtime (JIT-compiled, like the
reference's torch extension JIT at python/qtorch/jit.py:13-22 — but cached
instead of force-rebuilt, fixing its rmtree-every-import brittleness).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "lowbit_runtime.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")

_lib: Optional[ctypes.CDLL] = None


def _compile() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"lowbit_runtime_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", so_path + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
    return so_path


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_compile())
        i8p = ctypes.POINTER(ctypes.c_int8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.refconv2d_int8.argtypes = [i8p, i8p, i32p] + [ctypes.c_int] * 12
        lib.preprocess_quantize_u8.argtypes = [
            u8p, i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_float]
        lib.pack_int4.argtypes = [i8p, u8p, ctypes.c_int64]
        lib.unpack_int4.argtypes = [u8p, i8p, ctypes.c_int64]
        lib.omp_max_threads.restype = ctypes.c_int
        _lib = lib
    return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def refconv2d_int8(
    x: np.ndarray, w: np.ndarray,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    groups: int = 1,
) -> np.ndarray:
    """Native NHWC int8 conv oracle. x (N,H,W,C) int8, w (KH,KW,C/g,K) int8."""
    lib = load()
    x = np.ascontiguousarray(x, np.int8)
    w = np.ascontiguousarray(w, np.int8)
    n, h, wd, c = x.shape
    kh, kw, cg, k = w.shape
    assert cg * groups == c
    sh, sw = stride
    ph, pw = padding
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (wd + 2 * pw - kw) // sw + 1
    out = np.empty((n, oh, ow, k), np.int32)
    lib.refconv2d_int8(_ptr(x, ctypes.c_int8), _ptr(w, ctypes.c_int8),
                       _ptr(out, ctypes.c_int32),
                       n, h, wd, c, kh, kw, k, sh, sw, ph, pw, groups)
    return out


def preprocess_quantize(
    imgs: np.ndarray,                   # (N,H,W,C) uint8
    mean: np.ndarray, std: np.ndarray,  # (C,) float
    act_scale: float,
) -> np.ndarray:
    """Fused normalize+quantize on the host CPU (OpenMP): the input stage of
    the serving pipeline. Returns int8 NHWC ready for device upload."""
    lib = load()
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, c = imgs.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((n, h, w, c), np.int8)
    lib.preprocess_quantize_u8(_ptr(imgs, ctypes.c_uint8),
                               _ptr(out, ctypes.c_int8),
                               n, h, w, c, _ptr(mean, ctypes.c_float),
                               _ptr(std, ctypes.c_float),
                               ctypes.c_float(act_scale))
    return out


def pack_int4_native(vals: np.ndarray) -> np.ndarray:
    lib = load()
    vals = np.ascontiguousarray(vals, np.int8)
    assert vals.shape[-1] % 2 == 0
    flat = vals.reshape(-1)
    out = np.empty(flat.size // 2, np.uint8)
    lib.pack_int4(_ptr(flat, ctypes.c_int8), _ptr(out, ctypes.c_uint8),
                  flat.size // 2)
    return out.reshape(*vals.shape[:-1], vals.shape[-1] // 2)


def unpack_int4_native(packed: np.ndarray) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    flat = packed.reshape(-1)
    out = np.empty(flat.size * 2, np.int8)
    lib.unpack_int4(_ptr(flat, ctypes.c_uint8), _ptr(out, ctypes.c_int8),
                    flat.size)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)
