"""INT4 weight packing: two nibbles per int8 byte for HBM residence.

The reference has no int4 path; BASELINE.json config 5 requires INT4
weight-only with INT8 activations. On TPU the MXU computes int8×int8→int32,
so int4 is a *storage/bandwidth* format: weights live packed in HBM (halving
weight bytes — the win for bandwidth-bound layers) and are unpacked to int8
on the fly (in-kernel via bit ops on the VPU, or by XLA for the fallback path).

Packing convention: values in [-8, 7] are stored as plain two's-complement
nibbles (0x0 = 0, 0x8 = -8, 0xF = -1) pairwise along the LAST axis:
byte = (hi << 4) | lo where lo is the even element, hi the odd. The last
axis length must be even. The C++ runtime and checkpoint reader use the
same encoding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_int4(values: jax.Array) -> jax.Array:
    """Pack int8-stored int4 values (in [-8, 7]) into uint8, halving last dim."""
    if values.shape[-1] % 2 != 0:
        raise ValueError(f"last dim must be even to pack, got {values.shape}")
    u = (values.astype(jnp.int32) & 0xF).astype(jnp.uint8)  # two's-complement nibble
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (hi << 4) | lo


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: uint8 → int8 values in [-8, 7], doubling last dim."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    # Sign-extend 4-bit two's complement: x >= 8 → x - 16.
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)
