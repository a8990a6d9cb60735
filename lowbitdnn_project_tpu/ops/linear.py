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
    interpret: bool = False,
) -> Union[jax.Array, QTensor]:
    if x_q.axis is not None:
        raise NotImplementedError("per-channel activation scales unsupported")
    if x_q.zero_point is not None or w_q.zero_point is not None:
        # qconv2d handles asymmetric inputs with the zp*colsum(w) correction
        # (ops/conv.py); qlinear has no such epilogue — silently computing
        # x*w without it would be wrong, so refuse loudly.
        raise NotImplementedError(
            "qlinear does not support asymmetric (zero_point) tensors; "
            "re-quantize symmetrically or route through qconv2d's 1x1 path")
    k_out = w_q.shape[1]
    scale = jnp.broadcast_to(
        (x_q.scale * w_q.scale_vector()).astype(jnp.float32).reshape(-1),
        (k_out,))
    requant = out_scale is not None
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
