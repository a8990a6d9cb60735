"""QTensor — a quantized array that carries its own scale.

The reference stashes scales in a process-global dict keyed by tensor object
(``python/qtorch/nn/functional/quantization.py:24`` QUANTIZATION_PARAMETERS,
written at ``:138``), which breaks under tracing and functional transforms.
Here the scale travels *with* the values as one pytree, so QTensors flow
through jit / grad / shard_map like any other array.

Scales are symmetric (no zero point) like the reference's
``_quantization_params`` (``quantization.py:90-110``): int8 covers
[-127, 127], int4 covers [-7, 7]. Per-tensor scale is a () array; per-channel
scale keeps one dim of the value shape (``axis``) and broadcasts over the rest.

Asymmetric ("uint8") activations — the reference's uint8x4 configs
(cpp/apps/config.json:55-80, fused uint8 quantize at
cpp/int8conv/conv2DForward3x3Fused.cuh:15-60) — are carried as int8 storage
plus a ``zero_point`` (canonically -128, making the payload exactly uint8
shifted by 128: real = (q - zp) * scale, 256 levels over [0, absmax]).
Int8 storage keeps the MXU int8 path; the zp is corrected in the conv
epilogue via precomputed weight row-sums (ops/conv.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# Quantized range per bit-width: symmetric, zero always representable.
QMAX = {8: 127, 4: 7, 2: 1}


@struct.dataclass
class QTensor:
    """Quantized tensor: int8-stored values + float32 scale.

    Attributes:
      values: integer payload, stored as int8 (int4 values occupy int8 storage
        unpacked; see quant/int4.py for the packed HBM format).
      scale: float32 dequantization scale. Shape () for per-tensor, or a
        broadcast-compatible shape with exactly one non-1 dim for per-channel.
      bits: logical bit-width (8 or 4) — static.
      axis: channel axis the scale varies along, or None for per-tensor — static.
      zero_point: integer zero point for asymmetric ("uint8") payloads, or
        None for symmetric. real = (values - zero_point) * scale. Static
        (not a pytree leaf): it is canonically the CONSTANT -128, and keeping
        it a Python int lets consumers use it as a compile-time constant
        (static pad values, bias-folded epilogue corrections) instead of a
        traced array that forces extra ops into the conv->requant chain.
    """

    values: jax.Array
    scale: jax.Array
    bits: int = struct.field(pytree_node=False, default=8)
    axis: Optional[int] = struct.field(pytree_node=False, default=None)
    zero_point: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def ndim(self) -> int:
        return self.values.ndim

    @property
    def qmax(self) -> int:
        return QMAX[self.bits]

    def scale_vector(self) -> jax.Array:
        """Scale flattened to 1D of length shape[axis] (or () if per-tensor)."""
        if self.axis is None:
            return self.scale
        return self.scale.reshape(self.shape[self.axis])

    def dequantize(self) -> jax.Array:
        v = self.values.astype(jnp.float32)
        if self.zero_point is not None:
            v = v - float(self.zero_point)
        return v * self.scale

    def astype_float(self, dtype=jnp.float32) -> jax.Array:
        return self.dequantize().astype(dtype)


def scale_shape(shape: Tuple[int, ...], axis: Optional[int]) -> Tuple[int, ...]:
    """Broadcastable shape for a per-channel scale along ``axis``."""
    if axis is None:
        return ()
    axis = axis % len(shape)
    return tuple(shape[i] if i == axis else 1 for i in range(len(shape)))
