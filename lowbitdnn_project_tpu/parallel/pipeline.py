"""Pipeline parallelism (PP): GPipe-style microbatch pipeline over a mesh
axis, with ppermute stage-to-stage handoff.

Completes the parallel layer's axis map (batch=DP, channels=TP, space=SP,
depth=PP). PP is the right axis when a model's weights exceed one chip's
HBM but its stages are a homogeneous tower (repeated residual blocks):
device r holds ONLY stage r's parameters; activations flow r -> r+1 over
ICI while all stages compute on different microbatches.

Mechanics (the scaling-book pipelining recipe):
  * Stage parameters are stacked on a leading (S, ...) axis and sharded
    over the pipeline axis — each device materializes 1/S of the weights.
  * A lax.fori_loop runs M + S - 1 ticks. Each tick: stage 0 ingests the
    next microbatch, every stage applies its block to its current
    activation, stage S-1 records its finished microbatch, and a single
    ppermute shifts activations one stage down the ring. The S-1 warm-up /
    drain ticks are the pipeline bubble: utilization = M / (M + S - 1).
  * Like jax.lax control flow requires, the loop body is shape-static;
    ingest/emit are select/dynamic-index ops predicated on the tick.

Scope: homogeneous stages (every stage's params share one pytree
structure/shape — the stacked-leaf representation requires it). CNN stems /
heterogeneous stage towers run outside the PP region on their own devices;
documented, not hidden. Bit-exactness vs the sequential tower is asserted
in tests/test_pipeline.py (integer blocks exact; float epilogues within the
repo's |delta| <= 1 requant oracle).

Reference parity: the reference is single-GPU (SURVEY.md §2); this is the
TPU-native distributed layer's depth axis.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "stage"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D mesh whose only axis is the pipeline ("stage") axis."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"{n_stages} stages > {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def shard_stage_params(params_stacked: Any, mesh: Mesh) -> Any:
    """Place stage-stacked params (leading axis S on every leaf) with each
    stage's slice on its pipeline device."""
    s = mesh.shape[PIPE_AXIS]

    def put(leaf):
        if leaf.shape[0] != s:
            raise ValueError(
                f"stacked leaf leading axis {leaf.shape[0]} != stages {s}")
        spec = P(PIPE_AXIS, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params_stacked)


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    params_local: Any,            # stage-sliced params, leaves (1, ...)
    xs: jax.Array,                # (M, ...) microbatches (replicated)
    axis_name: str = PIPE_AXIS,
) -> jax.Array:
    """shard_map BODY: run the microbatch pipeline; returns (M, ...) outputs
    (valid on every device — the final buffer is all-gathered from the last
    stage via one psum-of-masked, so out_specs can be P()).

    block_fn(params, x) must map an activation to one of the SAME shape
    (residual-tower contract; enforced).

    Use with:
      shard_map(pipeline_apply, mesh=mesh,
                in_specs=(P(PIPE_AXIS, ...), P()), out_specs=P())
    """
    s = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    m = xs.shape[0]
    params = jax.tree_util.tree_map(lambda a: a[0], params_local)

    # shape-contract check without executing the stage (eval_shape is free
    # both under jit and in eager shard_map use)
    y0 = jax.eval_shape(lambda: block_fn(params, xs[0]))
    if y0.shape != xs.shape[1:]:
        raise ValueError(
            f"pipeline block must preserve shape: {xs.shape[1:]} -> "
            f"{y0.shape}")

    shift = [(i, i + 1) for i in range(s - 1)]
    # the carry is device-varying inside the loop (each stage holds a
    # different microbatch); mark the replicated zeros as varying up front
    # so the fori_loop carry type is stable (shard_map vma typing)
    state = jax.lax.pcast(jnp.zeros_like(xs[0]), axis_name, to="varying")
    outbuf = jax.lax.pcast(jnp.zeros_like(xs), axis_name, to="varying")

    def tick(t, carry):
        state, outbuf = carry
        # stage 0 ingests microbatch t (clamped; masked out after t >= M)
        inp = jax.lax.dynamic_index_in_dim(
            xs, jnp.minimum(t, m - 1), 0, keepdims=False)
        ingest = jnp.logical_and(rank == 0, t < m)
        state = jnp.where(ingest, inp, state)
        y = block_fn(params, state)
        # stage S-1 emits microbatch t-(S-1). Mask the PAYLOAD, not the
        # buffer: one slice read + one slice write per tick (O(slice)), not
        # an O(M) whole-buffer rewrite on every stage every tick.
        mb = t - (s - 1)
        idx = jnp.clip(mb, 0, m - 1)
        emit = jnp.logical_and(rank == s - 1, mb >= 0)
        cur = jax.lax.dynamic_index_in_dim(outbuf, idx, 0, keepdims=False)
        outbuf = jax.lax.dynamic_update_index_in_dim(
            outbuf, jnp.where(emit, y, cur), idx, 0)
        # one hop down the pipeline (stage S-1's y is consumed by emit)
        state = jax.lax.ppermute(y, axis_name, shift)
        return state, outbuf

    _, outbuf = jax.lax.fori_loop(0, m + s - 1, tick, (state, outbuf))
    # replicate the last stage's buffer to every device: all but stage S-1
    # hold zeros, so a psum is a broadcast (cheap: (M, ...) once per call)
    mask = (rank == s - 1).astype(outbuf.dtype)
    return jax.lax.psum(outbuf * mask, axis_name)


def run_pipeline(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    params_stacked: Any,          # leaves (S, ...), host or device
    xs: jax.Array,                # (M, ...) microbatches
    mesh: Mesh,
) -> jax.Array:
    """Convenience wrapper: shard the stacked params over the mesh's stage
    axis and run the jitted pipeline. Returns (M, ...) outputs."""
    from jax import shard_map

    in_spec_p = jax.tree_util.tree_map(
        lambda a: P(PIPE_AXIS, *([None] * (a.ndim - 1))), params_stacked)
    f = shard_map(
        lambda p, x: pipeline_apply(block_fn, p, x),
        mesh=mesh,
        in_specs=(in_spec_p, P()),
        out_specs=P())
    return jax.jit(f)(shard_stage_params(params_stacked, mesh),
                      jax.device_put(xs, NamedSharding(mesh, P())))
