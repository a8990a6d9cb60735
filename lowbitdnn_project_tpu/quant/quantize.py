"""Symmetric int8/int4 quantization (pure JAX, jit/vmap/shard_map-safe).

Capability parity with the reference quantizer
(``python/qtorch/nn/functional/quantization.py``):
  * dynamic symmetric quantization from the absmax (``_quantization_params``
    ``:90-110``), here upgraded with per-channel scales;
  * optional stochastic rounding (``_Quantize.forward`` ``:28-49`` adds
    uniform noise in [-1/2, 1/2) before round) via a JAX PRNG key;
  * straight-through estimator gradient (the reference's ``_Quantize.backward``
    passes grad through) via ``jax.custom_jvp``;
  * dequantize (``:144-152``).

Unlike the reference, the scale is returned inside the QTensor rather than a
global registry, and a precomputed (static/calibrated) scale can be supplied.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QMAX, QTensor, scale_shape


def compute_scale(
    x: jax.Array,
    bits: int = 8,
    axis: Optional[int] = None,
    eps: float = 1e-12,
    percentile: Optional[float] = None,
) -> jax.Array:
    """Symmetric range scale: per-tensor (axis=None) or per-channel.

    Reference analogue: ``_quantization_params`` (quantization.py:90-110),
    which uses per-tensor ``max(|x|)/qmax``. Per-channel is the upgrade the
    reference's fused kernel hints at (per-4-channel-group scales,
    cpp/int8conv/conv2DForward3x3Fused.cuh:15-31).

    percentile: clip the range at the p-th percentile of |x| instead of the
    absmax (values beyond it saturate at the quantize clip). Matters most
    for int4 WEIGHT ranges, where one outlier costs half the 15-level grid
    (A/B'd in accuracy_parity.json).
    """
    qmax = QMAX[bits]
    if axis is None:
        a = jnp.abs(x)
        r = jnp.max(a) if percentile is None else jnp.percentile(a, percentile)
        return jnp.maximum(r, eps).astype(jnp.float32) / qmax
    axis = axis % x.ndim
    reduce_dims = tuple(i for i in range(x.ndim) if i != axis)
    a = jnp.abs(x)
    if percentile is None:
        r = jnp.max(a, axis=reduce_dims, keepdims=True)
    else:
        r = jnp.percentile(a, percentile, axis=reduce_dims, keepdims=True)
    return jnp.maximum(r, eps).astype(jnp.float32) / qmax


def group_channel_scale(
    x: jax.Array,
    group_size: int = 32,
    bits: int = 8,
    axis: int = -1,
    eps: float = 1e-12,
) -> jax.Array:
    """Per-GROUP symmetric scale, expanded to per-channel (group-constant).

    The reference's fused kernel quantizes activations with per-4-channel-
    group scales (cpp/int8conv/conv2DForward3x3Fused.cuh:15-31); this builds
    the TPU analogue: one absmax scale per ``group_size`` channels along
    ``axis``, repeated within each group so the result is a valid per-channel
    QTensor scale (shape C along axis). qconv2d consumes it exactly via its
    group-split path (ops/conv.py act_group_size must divide group_size or
    equal it).
    """
    axis = axis % x.ndim
    c = x.shape[axis]
    if c % group_size:
        raise ValueError(f"group_size {group_size} must divide channels {c}")
    a = jnp.abs(jnp.moveaxis(x, axis, -1).reshape(-1, c // group_size,
                                                  group_size))
    r = jnp.max(a, axis=(0, 2))                       # (G,) group absmax
    per_group = jnp.maximum(r, eps).astype(jnp.float32) / QMAX[bits]
    per_chan = jnp.repeat(per_group, group_size)      # (C,) group-constant
    shape = [1] * x.ndim
    shape[axis] = c
    return per_chan.reshape(shape)


@jax.custom_jvp
def _round_ste(x: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (ref _Quantize.backward)."""
    return jnp.round(x)


@_round_ste.defjvp
def _round_ste_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return jnp.round(x), t


UINT8_ZP = -128  # canonical zero point: int8 payload == uint8 shifted by 128


def quantize(
    x: jax.Array,
    bits: int = 8,
    axis: Optional[int] = None,
    scale: Optional[jax.Array] = None,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
    unsigned: bool = False,
) -> QTensor:
    """Quantize a float array to an int8-stored QTensor.

    Args:
      x: float input.
      bits: 8 or 4 (int4 values still stored one-per-int8; see int4.py to pack).
      axis: per-channel axis for the scale, or None for per-tensor.
      scale: optional precomputed scale (static quantization); dynamic absmax
        otherwise.
      stochastic: add uniform(-0.5, 0.5) noise before rounding, like the
        reference's noise path (quantization.py:36-40).
      key: PRNG key, required when stochastic=True.
      unsigned: asymmetric "uint8" mode for one-sided (post-ReLU) data — the
        reference's uint8x4 activation path (cpp/apps/config.json:55-80,
        conv2DForward3x3Fused.cuh:15-60). 256 levels over [0, absmax]
        (scale = absmax/255 when dynamic; a supplied ``scale`` is used
        verbatim), stored as int8 with zero_point = -128. Negative inputs
        clip to 0. bits must be 8.
    """
    if unsigned:
        if bits != 8:
            raise NotImplementedError("unsigned quantization is uint8-only")
        if axis is not None:
            raise NotImplementedError(
                "per-channel asymmetric activations unsupported")
        if scale is None:
            scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) \
                .astype(jnp.float32) / 255.0
        else:
            scale = jnp.asarray(scale, jnp.float32).reshape(())
        scaled = x.astype(jnp.float32) / scale
        if stochastic:
            if key is None:
                raise ValueError("stochastic=True requires a PRNG key")
            scaled = scaled + jax.random.uniform(
                key, x.shape, jnp.float32, -0.5, 0.5)
        # shift inside the round (round(y)+c == round(y+c) for integer c):
        # one fused affine + round + clip, same graph shape as symmetric
        q = jnp.clip(_round_ste(scaled + UINT8_ZP), -128, 127).astype(jnp.int8)
        return QTensor(values=q, scale=scale, bits=8, axis=None,
                       zero_point=UINT8_ZP)
    qmax = QMAX[bits]
    if scale is None:
        scale = compute_scale(x, bits=bits, axis=axis)
    else:
        scale = jnp.asarray(scale, jnp.float32).reshape(scale_shape(x.shape, axis))
    scaled = x.astype(jnp.float32) / scale
    if stochastic:
        if key is None:
            raise ValueError("stochastic=True requires a PRNG key")
        noise = jax.random.uniform(key, x.shape, jnp.float32, -0.5, 0.5)
        scaled = scaled + noise
    q = jnp.clip(_round_ste(scaled), -qmax, qmax).astype(jnp.int8)
    return QTensor(values=q, scale=scale, bits=bits, axis=axis)


def dequantize(q: QTensor, dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize (reference quantization.py:144-152)."""
    return q.dequantize().astype(dtype)


def fake_quantize(
    x: jax.Array,
    bits: int = 8,
    axis: Optional[int] = None,
    scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantize-dequantize round trip with STE gradient — QAT building block.

    Stays float end-to-end (no int8 cast, which would zero the gradient);
    numerically identical to dequantize(quantize(x, ...)).
    """
    qmax = QMAX[bits]
    if scale is None:
        scale = jax.lax.stop_gradient(compute_scale(x, bits=bits, axis=axis))
    else:
        scale = jnp.asarray(scale, jnp.float32).reshape(scale_shape(x.shape, axis))
    q = jnp.clip(_round_ste(x.astype(jnp.float32) / scale), -qmax, qmax)
    return q * scale
