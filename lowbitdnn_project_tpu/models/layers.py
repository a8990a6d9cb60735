"""Quantized layer building blocks + FP32->INT8 parameter conversion.

Reference analogues: QConv2D module (python/qtorch/nn/QConv2d.py:6-22 — an
nn.Conv2d whose forward quantizes and calls the int8 op) and Int8Conv2d
(python/df-optimization/Int8Conv2d.py — pure-int8 weights). Here layers are
functional: a params pytree + apply functions, which is the JAX idiom and
what pjit/shard_map expect.

BatchNorm folding: the reference has no BN (its models are BN-free research
CNNs), but ImageNet CNNs need conv+BN+ReLU collapsed to conv+bias+ReLU
before quantization — standard inference-graph prep, done here.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from lowbitdnn_project_tpu.quant import QTensor, quantize
from lowbitdnn_project_tpu.ops import qconv2d, qlinear


@struct.dataclass
class QConvParams:
    """Quantized conv layer parameters: int8 HWIO weight + folded float bias."""
    weight: QTensor                       # (KH, KW, C/groups, K), axis=3 scale
    bias: Optional[jax.Array] = None      # (K,) f32, BN pre-folded


@struct.dataclass
class QLinearParams:
    weight: QTensor                       # (K_in, K_out), axis=1 scale
    bias: Optional[jax.Array] = None


def fold_bn(
    w: jax.Array,                          # (KH, KW, C, K) f32
    b: Optional[jax.Array],                # (K,) f32 or None
    gamma: jax.Array, beta: jax.Array,
    mean: jax.Array, var: jax.Array,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold BatchNorm into the preceding conv: w' = w*g/σ, b' = β + (b-μ)g/σ."""
    inv_sigma = gamma / jnp.sqrt(var + eps)          # (K,)
    w_f = w * inv_sigma.reshape(1, 1, 1, -1)
    b0 = b if b is not None else jnp.zeros_like(mean)
    b_f = beta + (b0 - mean) * inv_sigma
    return w_f, b_f


def quantize_conv(w: jax.Array, bias: Optional[jax.Array], bits: int = 8
                  ) -> QConvParams:
    """FP32 HWIO conv weight -> per-out-channel int8/int4 QConvParams."""
    return QConvParams(weight=quantize(w, bits=bits, axis=3), bias=bias)


def quantize_linear(w: jax.Array, bias: Optional[jax.Array], bits: int = 8
                    ) -> QLinearParams:
    return QLinearParams(weight=quantize(w, bits=bits, axis=1), bias=bias)


def conv_block(
    x: jax.Array,                          # float NHWC
    p: QConvParams,
    *,
    stride=1,
    padding=0,
    groups: int = 1,
    relu: bool = False,
    act_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Float-in/float-out quantized conv: dynamic (or calibrated static)
    activation quantization + int8 conv with fused epilogue.

    This is the reference's "external" config flow (qconv2d.py:49-71:
    quantize input -> int8 conv -> float out), with the dequant folded into
    the kernel epilogue. A static ``act_scale`` (from calibration) removes
    the dynamic absmax reduction pass — the big inference win.
    """
    x_q = quantize(x, scale=act_scale)
    return qconv2d(x_q, p.weight, p.bias, stride=stride, padding=padding,
                   groups=groups, relu=relu, out_dtype=out_dtype,
                   backend=backend, interpret=interpret)


def linear_block(
    x: jax.Array,
    p: QLinearParams,
    *,
    relu: bool = False,
    act_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    x_q = quantize(x, scale=act_scale)
    return qlinear(x_q, p.weight, p.bias, relu=relu, out_dtype=out_dtype,
                   backend=backend, interpret=interpret)
