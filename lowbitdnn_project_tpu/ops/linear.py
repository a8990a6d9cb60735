"""Quantized fully-connected layer over the fused int8 GEMM.

No direct reference counterpart (the reference's MNIST head is a conv used as
a linear, python/tmp.py:52-55); required for ResNet/MobileNet classifier
heads. Same epilogue semantics as qconv2d.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QTensor
from lowbitdnn_project_tpu.kernels.matmul_int8 import (
    int8_matmul_fused,
    int8_matmul_xla,
)


def qlinear(
    x_q: QTensor,            # (M, K_in) int8, per-tensor scale
    w_q: QTensor,            # (K_in, K_out) int8, per-tensor or axis=1 scale
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    backend: str = "auto",
    act_group_size: int = 32,
    interpret: bool = False,
) -> Union[jax.Array, QTensor]:
    """act_group_size: see qconv2d — per-channel (group-constant) activation
    scales run as one exact int8 GEMM per scale group, weighted-summed
    (reference per-group algebra, conv2DForward3x3Fused.cuh:15-31)."""
    if x_q.zero_point is not None or w_q.zero_point is not None:
        # qconv2d handles asymmetric inputs with the zp*colsum(w) correction
        # (ops/conv.py); qlinear has no such epilogue — silently computing
        # x*w without it would be wrong, so refuse loudly.
        raise NotImplementedError(
            "qlinear does not support asymmetric (zero_point) tensors; "
            "re-quantize symmetrically or route through qconv2d's 1x1 path")
    k_out = w_q.shape[1]
    requant = out_scale is not None
    if x_q.axis is not None:
        if (x_q.axis % x_q.ndim) != x_q.ndim - 1:
            raise NotImplementedError(
                "per-channel activation scales must be on the feature axis")
        k_in = x_q.shape[-1]
        gs = min(act_group_size, k_in)
        if k_in % gs:
            raise ValueError(
                f"act_group_size {gs} must divide in-features {k_in}")
        ngrp = k_in // gs
        sx = x_q.scale_vector().reshape(ngrp, gs)[:, 0]
        partials = jnp.stack([
            jax.lax.dot_general(
                jax.lax.slice_in_dim(x_q.values, g * gs, (g + 1) * gs,
                                     axis=1),
                jax.lax.slice_in_dim(w_q.values, g * gs, (g + 1) * gs,
                                     axis=0),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            for g in range(ngrp)])                     # (G, M, K_out)
        out = jnp.tensordot(sx.astype(jnp.float32),
                            partials.astype(jnp.float32), axes=1)
        out = out * jnp.broadcast_to(
            jnp.asarray(w_q.scale_vector(), jnp.float32).reshape(-1),
            (k_out,))
        if bias is not None:
            out = out + jnp.asarray(bias, jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        if requant:
            q = jnp.round(out * (1.0 / jnp.asarray(out_scale, jnp.float32)))
            out = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
            return QTensor(values=out,
                           scale=jnp.asarray(out_scale, jnp.float32))
        return out.astype(out_dtype)
    scale = jnp.broadcast_to(
        (x_q.scale * w_q.scale_vector()).astype(jnp.float32).reshape(-1),
        (k_out,))
    if backend == "auto":
        backend = "gemm" if jax.default_backend() != "cpu" else "xla"
    fn = int8_matmul_fused if backend == "gemm" else int8_matmul_xla
    kwargs = dict(relu=relu, requant=requant, out_dtype=out_dtype)
    if backend == "gemm":
        kwargs["interpret"] = interpret
    out = fn(x_q.values, w_q.values, scale, bias, out_scale, **kwargs)
    if requant:
        return QTensor(values=out, scale=jnp.asarray(out_scale, jnp.float32))
    return out
