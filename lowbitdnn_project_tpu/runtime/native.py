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
        lib.loader_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_float, ctypes.c_int]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_submit.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
        lib.loader_submit.restype = ctypes.c_int64
        lib.loader_next.argtypes = [ctypes.c_void_p, i8p]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_pending.argtypes = [ctypes.c_void_p]
        lib.loader_pending.restype = ctypes.c_int
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
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


class PrefetchLoader:
    """Threaded native data pipeline: C++ worker threads run the fused
    normalize+quantize (uint8 HWC -> int8 NHWC) on submitted raw batches
    while the device computes. FIFO (submission order), bounded job queue
    for backpressure, ctypes calls release the GIL so `get()` blocking in
    C++ never stalls the workers.

    Usage (see examples/serve_resnet50.py):
        with PrefetchLoader(mean, std, act_scale, hw=(224, 224)) as ld:
            for raw in raw_batches: ld.submit(raw)
            for _ in raw_batches: x_int8 = ld.get()
    """

    def __init__(self, mean: np.ndarray, std: np.ndarray, act_scale: float,
                 hw=(224, 224), channels: int = 3, n_threads: int = 4,
                 capacity: int = 4):
        self._lib = load()
        self._h, self._w, self._c = hw[0], hw[1], channels
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        assert mean.size == self._c and std.size == self._c
        self._sizes: "list[int]" = []
        self._handle = self._lib.loader_create(
            int(n_threads), self._h, self._w, self._c,
            _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
            ctypes.c_float(float(act_scale)), int(capacity))

    def submit(self, imgs: np.ndarray) -> None:
        """Enqueue a (N,H,W,C) uint8 batch; blocks when `capacity` raw jobs
        are already waiting."""
        imgs = np.ascontiguousarray(imgs, np.uint8)
        n, h, w, c = imgs.shape
        assert (h, w, c) == (self._h, self._w, self._c), imgs.shape
        seq = self._lib.loader_submit(self._handle,
                                      _ptr(imgs, ctypes.c_uint8), n)
        if seq < 0:
            raise RuntimeError("PrefetchLoader.submit() after close()")
        self._sizes.append(n)

    def get(self) -> np.ndarray:
        """Blocking pop of the next preprocessed int8 batch, in submission
        order."""
        if not self._sizes:
            raise RuntimeError("PrefetchLoader.get() with nothing submitted")
        n = self._sizes.pop(0)
        out = np.empty((n, self._h, self._w, self._c), np.int8)
        got = self._lib.loader_next(self._handle, _ptr(out, ctypes.c_int8))
        assert got == n, (got, n)
        return out

    def pending(self) -> int:
        return int(self._lib.loader_pending(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def unpack_int4_native(packed: np.ndarray) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    flat = packed.reshape(-1)
    out = np.empty(flat.size * 2, np.int8)
    lib.unpack_int4(_ptr(flat, ctypes.c_uint8), _ptr(out, ctypes.c_int8),
                    flat.size)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)
