"""Quantized pooling.

Reference parity: int8 max-pool via cuDNN CUDNN_POOLING_MAX_DETERMINISTIC on
NCHW_VECT_C (python/qtorch/cpp/pool2d.cuh:41,54-92). On TPU, max over an int8
window is natively a `reduce_window` — deterministic by construction, runs on
the VPU, and scale passes through untouched (max commutes with positive
scaling). Average pooling accumulates in int32 and divides in the float
domain (no reference counterpart; needed by ResNet/MobileNet heads).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QTensor


def _pair(v):
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def qmax_pool2d(
    x_q: QTensor,
    ksize: Union[int, Tuple[int, int]] = 2,
    stride: Union[int, Tuple[int, int], None] = None,
    padding: Union[int, Tuple[int, int]] = 0,
) -> QTensor:
    """int8 max pool (NHWC). Scale is unchanged: max(s*q) = s*max(q), s>0."""
    kh, kw = _pair(ksize)
    sh, sw = _pair(stride if stride is not None else ksize)
    ph, pw = _pair(padding)
    out = jax.lax.reduce_window(
        x_q.values,
        jnp.asarray(-128, x_q.values.dtype),
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    # zero_point passes through like the scale (max commutes with any
    # monotone affine map); the -128 pad init is also exact for asymmetric
    # post-ReLU payloads (zp=-128 => pad represents real 0, the data min)
    return QTensor(values=out, scale=x_q.scale, bits=x_q.bits, axis=x_q.axis,
                   zero_point=x_q.zero_point)


def max_pool2d(
    x: jax.Array,
    ksize: Union[int, Tuple[int, int]] = 2,
    stride: Union[int, Tuple[int, int], None] = None,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    """Float max pool (NHWC) — the FP32 baseline twin of qmax_pool2d."""
    kh, kw = _pair(ksize)
    sh, sw = _pair(stride if stride is not None else ksize)
    ph, pw = _pair(padding)
    # NB: init must be a Python scalar, not a device array — an array init
    # becomes a tracer under jit and defeats the reduce_window-max VJP rule.
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def global_avg_pool2d_int32(x_q: QTensor) -> jax.Array:
    """Global average pool with exact int32 accumulation, float output.

    Returns float (N, C): sum(int8) * scale / (H*W). Used by classifier heads.
    """
    n, h, w, c = x_q.shape
    acc = jnp.sum(x_q.values.astype(jnp.int32), axis=(1, 2))
    if x_q.zero_point is not None:
        acc = acc - (h * w) * x_q.zero_point
    # scale_vector(): () per-tensor or (C,) per-channel — both broadcast
    # correctly against the (N, C) sum (a raw (1,1,1,C) scale would not).
    return acc.astype(jnp.float32) * x_q.scale_vector() / (h * w)


def avg_pool2d(x: jax.Array, ksize=2, stride=None, padding=0) -> jax.Array:
    """Float average pool (NHWC)."""
    kh, kw = _pair(ksize)
    sh, sw = _pair(stride if stride is not None else ksize)
    ph, pw = _pair(padding)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return summed / (kh * kw)
