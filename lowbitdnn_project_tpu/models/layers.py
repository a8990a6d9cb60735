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
    """Quantized conv layer parameters: int8 HWIO weight + folded float bias.

    w4pack: optional nibble-packed int4 form of a 1x1 weight
    ((C//2, K) uint8, kernels/matmul_w4a8.py pack layout). Present only on
    layers prepacked by prepack_w4a8_1x1 — its presence routes the conv
    through the W4A8 Pallas kernel in serving mode (halved weight HBM
    traffic; the measured win for weight-bound small-batch 1x1 layers).
    """
    weight: QTensor                       # (KH, KW, C/groups, K), axis=3 scale
    bias: Optional[jax.Array] = None      # (K,) f32, BN pre-folded
    w4pack: Optional[jax.Array] = None    # (C//2, K) uint8, 1x1 only


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


def quantize_conv(w: jax.Array, bias: Optional[jax.Array], bits: int = 8,
                  percentile: Optional[float] = None) -> QConvParams:
    """FP32 HWIO conv weight -> per-out-channel int8/int4 QConvParams.

    percentile clips each out-channel's range at the p-th percentile of
    |w| instead of the absmax (outliers saturate) — the int4 weight-range
    strategy A/B'd in accuracy_parity.json."""
    from lowbitdnn_project_tpu.quant import compute_scale

    scale = (None if percentile is None else
             compute_scale(w, bits=bits, axis=3, percentile=percentile))
    return QConvParams(weight=quantize(w, bits=bits, axis=3, scale=scale),
                       bias=bias)


def quantize_linear(w: jax.Array, bias: Optional[jax.Array], bits: int = 8
                    ) -> QLinearParams:
    return QLinearParams(weight=quantize(w, bits=bits, axis=1), bias=bias)


def prepack_w4a8_1x1(qparams, *, min_cin: int = 256):
    """Nibble-pack the 1x1 conv weights of an INT4-quantized param pytree.

    Packs every QConvParams whose weight is 1x1, int4-quantized (bits=4),
    and has cin >= min_cin and even cin. Standalone probes
    (bench/one_by_one_probe.py --w4a8, v5e) showed batch-1 per-layer wins,
    but e2e A/B measured each in-chain Pallas insertion costing ~30 us at
    batch 1 (routed ResNet-50: 796 vs 276 us with 17 layers packed) — the
    serving chain defaults the routing OFF; this stays as an opt-in
    (use_w4a8_1x1=True) plus the on-disk/HBM footprint halving.
    """
    from lowbitdnn_project_tpu.kernels.matmul_w4a8 import pack_int4_rows

    def go(p):
        if not isinstance(p, QConvParams):
            return p
        kh, kw, cin, k = p.weight.shape
        if (kh, kw) != (1, 1) or p.weight.bits != 4 or cin < min_cin \
                or cin % 2:
            return p
        packed = pack_int4_rows(p.weight.values.reshape(cin, k))
        return QConvParams(weight=p.weight, bias=p.bias, w4pack=packed)

    return jax.tree_util.tree_map(
        go, qparams, is_leaf=lambda n: isinstance(n, QConvParams))


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
