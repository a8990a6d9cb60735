"""Explicit collectives for TP inference: ppermute ring all-gather.

The default TP path (parallel/sharding.py) annotates shardings and lets
XLA's SPMD partitioner insert + schedule the all-gathers (verified by HLO
inspection in tests/test_collectives.py). This module adds the HAND-ROLLED
alternative — a bidirectional ppermute ring all-gather inside shard_map —
so that when real multi-chip hardware is attached, overlap tuning is a
*measurement between two existing implementations*, not a build:

  * `ring_all_gather(y, axis)`   — ppermute ring, bandwidth-optimal on an
    ICI ring (the scaling-book all-gather recipe; each step moves 1/n of
    the data to each neighbor, n-1 steps).
  * `qconv2d_tp_ring(...)`       — K-sharded int8 conv whose output gather
    is the explicit ring, step-interleaved so XLA can overlap each hop
    with the concat/epilogue work of the previous chunk.

Reference parity: the reference has no distributed layer (SURVEY.md §2,
grep-verified); this is the TPU-native layer the north star requires.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lowbitdnn_project_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def ring_all_gather(y: jax.Array, axis_name: str = MODEL_AXIS) -> jax.Array:
    """All-gather `y` along `axis_name` via a ppermute ring (inside
    shard_map / pmapped code). Returns the shards concatenated in
    device-rank order along the LAST axis (the channel dim for the
    K-sharded conv below) — i.e. moveaxis(all_gather(y, axis), 0, -2)
    merged into the last dim, asserted bit-exact vs lax.all_gather in
    tests/test_collectives.py.

    Expressed as n-1 neighbor hops so the scheduler can overlap each hop
    with the per-chunk consumer work.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    chunks = [None] * n
    cur = y
    # walk the ring: after k hops this device holds the chunk of rank idx-k
    for k in range(n):
        src_rank = (idx - k) % n
        # place `cur` at its source rank; traced under shard_map so the
        # placement must be positionally uniform: build via select over all
        # ranks (n is tiny — the mesh model dim)
        chunks[k] = (src_rank, cur)
        if k + 1 < n:
            cur = jax.lax.ppermute(cur, axis_name, fwd)
    # order chunks by source rank: rank r arrived at hop k where
    # (idx - k) % n == r -> k = (idx - r) % n
    parts = []
    for r in range(n):
        sel = None
        for k, (src_rank, val) in enumerate(chunks):
            hit = (src_rank == r)
            sel = jnp.where(hit, val, sel) if sel is not None else \
                jnp.where(hit, val, jnp.zeros_like(val))
        parts.append(sel)
    return jnp.concatenate(parts, axis=-1)


def qconv2d_tp_ring(
    x: jax.Array,                 # (N/dp, H, W, C) int8, batch-sharded
    w: jax.Array,                 # (KH, KW, C, K/tp) int8, K-sharded
    scale: jax.Array,             # (K/tp,) f32 combined scale shard
    bias: Optional[jax.Array],    # (K/tp,) f32 shard or None
    *,
    stride=(1, 1),
    padding=(1, 1),
    relu: bool = False,
) -> jax.Array:
    """Body of a shard_map-ed K-sharded conv: local conv on the weight
    shard, fused epilogue, then explicit ring all-gather of output channels.

    Use with:
      shard_map(qconv2d_tp_ring, mesh=mesh,
                in_specs=(P(DATA,...), P(None,None,None,MODEL), ...),
                out_specs=P(DATA, None, None, None))
    """
    ph, pw = padding
    acc = jax.lax.conv_general_dilated(
        x, w, stride, ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale.reshape(1, 1, 1, -1)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1)
    if relu:
        out = jnp.maximum(out, 0.0)
    return ring_all_gather(out, MODEL_AXIS)


def qconv2d_tp_cshard(
    x: jax.Array,                 # (N/dp, H, W, C/tp) int8, C-sharded
    w: jax.Array,                 # (KH, KW, C/tp, K) int8, C-sharded
    scale: jax.Array,             # (K,) f32 combined scale (replicated)
    bias: Optional[jax.Array],    # (K,) f32 or None
    *,
    stride=(1, 1),
    padding=(1, 1),
    relu: bool = False,
    scatter: bool = True,
) -> jax.Array:
    """Body of a shard_map-ed INPUT-channel-sharded conv (SURVEY.md §2
    parallelism table: "reduce-scatter for C-sharded convs").

    Each device convolves its C/tp input-channel slice against the matching
    weight slice (partial int32 accumulation — exact: int32 partial sums
    commute), then combines over the model axis:

      scatter=True  -> psum_scatter over the K dim: the output comes back
        K-SHARDED, which is exactly the input layout of a following
        K-sharded (all-gather) layer — the classic alternating TP pattern
        moving half the bytes of an all-reduce per layer pair.
      scatter=False -> full psum (all-reduce): replicated output.

    The float epilogue runs AFTER the collective on the int32 sum (the
    partial scales are identical per shard, so epilogue-after-psum is
    bit-exact vs the unsharded conv + epilogue).

    Use with:
      shard_map(qconv2d_tp_cshard, mesh=mesh,
                in_specs=(P(DATA, None, None, MODEL),
                          P(None, None, MODEL, None), P(), P()),
                out_specs=P(DATA, None, None, MODEL if scatter else None))
    """
    ph, pw = padding
    acc = jax.lax.conv_general_dilated(
        x, w, stride, ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    if scatter:
        acc = jax.lax.psum_scatter(acc, MODEL_AXIS, scatter_dimension=3,
                                   tiled=True)
        tp = jax.lax.axis_size(MODEL_AXIS)
        r = jax.lax.axis_index(MODEL_AXIS)
        k = scale.shape[0] // tp
        scale = jax.lax.dynamic_slice_in_dim(scale, r * k, k)
        if bias is not None:
            bias = jax.lax.dynamic_slice_in_dim(bias, r * k, k)
    else:
        acc = jax.lax.psum(acc, MODEL_AXIS)
    out = acc.astype(jnp.float32) * scale.reshape(1, 1, 1, -1)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out
