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

Scope: stride-1 convs with symmetric SAME H-padding (kh == 2*ph + 1) — the
ResNet body 3x3 and 1x1 shapes. Strided/downsampling layers change the row
count per shard; run them outside the SP region (or re-shard around them).
This mirrors how the reference specializes kernels per shape class
(cpp/int8conv/check.cu stride-1 3x3 focus) rather than hiding an
unsupported case.

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
    if halo == 0:
        return x
    if x.shape[1] < halo:
        raise ValueError(
            f"halo ({halo}) exceeds local H ({x.shape[1]}); use fewer "
            f"spatial shards or a wider halo exchange")
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # rank r -> r+1
    up = [(i + 1, i) for i in range(n - 1)]     # rank r -> r-1
    from_above = jax.lax.ppermute(x[:, -halo:, :, :], axis_name, down)
    from_below = jax.lax.ppermute(x[:, :halo, :, :], axis_name, up)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def qconv2d_sp(
    x: jax.Array,                 # (N, H/sp, W, C) int8, H-sharded
    w: jax.Array,                 # (KH, KW, C, K) int8, replicated
    scale: jax.Array,             # (K,) or () f32 combined in*w scale
    bias: Optional[jax.Array] = None,   # (K,) f32 or None
    *,
    pad_w: Optional[int] = None,  # W padding; default (kw-1)//2 (SAME)
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,  # requant -> int8 (chain mode)
    axis_name: str = MODEL_AXIS,
) -> jax.Array:
    """Body of a shard_map-ed H-sharded conv: halo exchange + local conv +
    the same fused epilogue as ops.conv.qconv2d (dequant, bias, ReLU,
    optional requant to int8 with round+clip(+-127)).

    Requires kh odd (SAME H padding ph = (kh-1)//2 == halo). Output keeps
    the input's H sharding, so SP convs chain without re-sharding.

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

    xh = halo_exchange_rows(x, ph, axis_name)
    acc = jax.lax.conv_general_dilated(
        xh, w, (1, 1), ((0, 0), (pw, pw)),          # H already haloed: VALID
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
