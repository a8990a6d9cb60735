"""Spatial partitioning (SP): H-sharded int8 convs with ppermute halo exchange.

DP shards the batch and TP shards channels (parallel/sharding.py,
parallel/collective.py); neither helps when a SINGLE activation map is too
large for one chip (high-resolution inference, batch-1 serving of big
images). SP shards the H dimension of the NHWC activation across a mesh
axis. Each conv first exchanges its `ph` boundary rows with the ring
neighbors via `lax.ppermute`, then runs the local conv VALID in H / padded
in W:

  * ppermute moves only the halo rows (2*ph*W*C int8 bytes per device per
    layer) over ICI — the minimal possible communication for a conv, and a
    single overlappable hop per direction.
  * ppermute's "no source => zeros" semantics at the ring ends is exactly
    the zero padding of the unsharded conv, so the int32 accumulation is
    BIT-IDENTICAL to the single-device `ops.conv.conv2d_int32` (asserted
    across mesh shapes in tests/test_spatial.py). The float epilogue can
    differ from the unsharded program by 1 ULP (XLA fuses mul+bias into an
    FMA differently per program shape — measured 7.6e-6 max abs on CPU), so
    float outputs are compared allclose and requantized int8 with the
    repo's |delta| <= 1 oracle convention (CLAUDE.md).

Strided (downsampling) convs are supported with ASYMMETRIC halos: output
row j reads input rows [j*sh - ph, j*sh - ph + kh), so shard r (holding
H_local rows, H_local % sh == 0) needs ph rows from above and
max(0, kh - ph - sh) rows from below; the output stays H-sharded with
H_local/sh rows per shard, so strided and stride-1 SP convs chain freely.
qmax_pool2d_sp applies the same halo logic to the int8 max pool (ring-end
halo rows refilled with -128, the pool's pad identity, since ppermute's
missing-source rows arrive as 0). models/resnet.apply_spatial_int8chain
runs a WHOLE ResNet H-sharded — stem + residual stages — exiting SP only
when the feature map becomes too small to shard (static cut, computed from
shapes), which is SP's real use: batch-1 / big-image serving.

Reference parity: the reference is single-GPU (SURVEY.md §2 parallelism
table); SP completes the TPU-native distributed layer's axis map
(batch=DP, channels=TP, space=SP).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lowbitdnn_project_tpu.parallel.mesh import MODEL_AXIS


def halo_exchange_rows(x: jax.Array, halo: int,
                       axis_name: str = MODEL_AXIS) -> jax.Array:
    """Exchange `halo` boundary rows with ring neighbors (shard_map body).

    x: (N, H_local, W, C) shard. Returns (N, H_local + 2*halo, W, C): the
    neighbor-above's bottom rows, the local shard, the neighbor-below's top
    rows. Ring ends receive zeros (ppermute with no source), which equals
    the unsharded conv's zero padding.
    """
    return halo_exchange_rows_asym(x, halo, halo, axis_name)


def halo_exchange_rows_asym(
    x: jax.Array, top: int, bottom: int,
    axis_name: str = MODEL_AXIS,
    fill: Optional[int] = None,
) -> jax.Array:
    """Asymmetric halo exchange: `top` rows from the neighbor above,
    `bottom` rows from the neighbor below (either may be 0) — what strided
    convs need (output row j*sh-ph alignment gives top=ph,
    bottom=kh-ph-sh).

    Ring ends receive zeros (ppermute missing-source semantics == the
    conv's zero padding); pass ``fill`` to overwrite those rows with a
    different pad identity instead (e.g. -128 for the int8 max pool).
    """
    if top == 0 and bottom == 0:
        return x
    if x.shape[1] < max(top, bottom):
        raise ValueError(
            f"halo (top {top}, bottom {bottom}) exceeds local H "
            f"({x.shape[1]}); use fewer spatial shards")
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # rank r -> r+1
    up = [(i + 1, i) for i in range(n - 1)]     # rank r -> r-1
    parts = []
    if top:
        from_above = jax.lax.ppermute(x[:, -top:, :, :], axis_name, down)
        if fill is not None:
            from_above = jnp.where(rank == 0,
                                   jnp.full_like(from_above, fill),
                                   from_above)
        parts.append(from_above)
    parts.append(x)
    if bottom:
        from_below = jax.lax.ppermute(x[:, :bottom, :, :], axis_name, up)
        if fill is not None:
            from_below = jnp.where(rank == n - 1,
                                   jnp.full_like(from_below, fill),
                                   from_below)
        parts.append(from_below)
    return jnp.concatenate(parts, axis=1)


def qconv2d_sp(
    x: jax.Array,                 # (N, H/sp, W, C) int8, H-sharded
    w: jax.Array,                 # (KH, KW, C, K) int8, replicated
    scale: jax.Array,             # (K,) or () f32 combined in*w scale
    bias: Optional[jax.Array] = None,   # (K,) f32 or None
    *,
    stride: int = 1,              # H and W stride (downsampling layers)
    pad_w: Optional[int] = None,  # W padding; default (kw-1)//2 (SAME)
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,  # requant -> int8 (chain mode)
    axis_name: str = MODEL_AXIS,
) -> jax.Array:
    """Body of a shard_map-ed H-sharded conv: halo exchange + local conv +
    the same fused epilogue as ops.conv.qconv2d (dequant, bias, ReLU,
    optional requant to int8 with round+clip(+-127)).

    Stride 1 requires kh odd (SAME halo ph = (kh-1)//2). Strided convs use
    the asymmetric halo (top ph = (kh-1)//2, bottom kh-ph-stride); local H
    must be divisible by the stride so every shard emits H_local/stride rows and
    the output keeps the H sharding — SP convs chain without re-sharding.

    Use with:
      shard_map(qconv2d_sp, mesh=mesh,
                in_specs=(P(None, MODEL, None, None), P(), P(), P()),
                out_specs=P(None, MODEL, None, None))
    """
    kh, kw = w.shape[0], w.shape[1]
    if kh % 2 == 0:
        raise ValueError(f"qconv2d_sp: kh must be odd (SAME halo), got {kh}")
    ph = (kh - 1) // 2
    pw = (kw - 1) // 2 if pad_w is None else pad_w
    if stride > 1 and x.shape[1] % stride:
        raise ValueError(
            f"qconv2d_sp: local H ({x.shape[1]}) must be divisible by "
            f"stride {stride}")

    xh = halo_exchange_rows_asym(x, ph, max(0, kh - ph - stride), axis_name)
    acc = jax.lax.conv_general_dilated(
        xh, w, (stride, stride), ((0, 0), (pw, pw)),  # H haloed: VALID
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale.reshape(1, 1, 1, -1)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1)
    if relu:
        out = jnp.maximum(out, 0.0)
    if out_scale is not None:
        q = jnp.round(out * (1.0 / jnp.asarray(out_scale, jnp.float32)))
        out = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    return out


def qmax_pool2d_sp(
    x: jax.Array,                 # (N, H/sp, W, C) int8, H-sharded
    ksize: int = 3,
    stride: int = 2,
    padding: int = 1,
    axis_name: str = MODEL_AXIS,
) -> jax.Array:
    """H-sharded int8 max pool (shard_map body): asymmetric halo exchange
    (ring-end rows refilled with -128, the max-pool pad identity), then a
    local reduce_window VALID in H / padded in W. Same alignment rule as
    the strided conv: local H must be divisible by the stride; output keeps the H
    sharding with H_local/stride rows."""
    if x.shape[1] % stride:
        raise ValueError(
            f"qmax_pool2d_sp: local H ({x.shape[1]}) must be divisible by "
            f"stride {stride}")
    xh = halo_exchange_rows_asym(
        x, padding, max(0, ksize - padding - stride), axis_name, fill=-128)
    return jax.lax.reduce_window(
        xh,
        jnp.asarray(-128, x.dtype),
        jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
    )


def shard_spatial(x: jax.Array, mesh: Mesh,
                  axis_name: str = MODEL_AXIS) -> jax.Array:
    """Place an NHWC array H-sharded over `axis_name` (replicated on the
    other mesh axes). H must be divisible by the axis size."""
    sp = mesh.shape[axis_name]
    if x.shape[1] % sp:
        raise ValueError(
            f"H ({x.shape[1]}) not divisible by spatial shards ({sp})")
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis_name, None, None)))
