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

Two pipelines:
  * ``run_pipeline`` — homogeneous stages (every stage's params share one
    pytree structure/shape; stacked leaves sharded over the stage axis).
  * ``run_pipeline_het`` — HETEROGENEOUS stages (e.g. ResNet's four
    residual stages with different widths/spatial dims). Each stage's
    params are flattened to raw bytes, padded to the max stage size, and
    stacked into one (S, B) uint8 array sharded P(stage) — true 1/S weight
    residency without a common pytree structure. Activations travel as a
    flat max-size carrier vector; each device runs its stage via
    ``lax.switch`` on its stage index (SPMD requires one program; the
    switch holds all S stage graphs, executes one). Bit-exactness vs the
    sequential tower is asserted in tests/test_pipeline.py (integer blocks
    exact; float epilogues within the repo's |delta| <= 1 requant oracle).

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


# --------------------------------------------------- heterogeneous stages

def _leaf_meta(leaf):
    import numpy as np

    dt = jnp.asarray(leaf).dtype
    nbytes = int(np.prod(leaf.shape)) * dt.itemsize
    return tuple(leaf.shape), dt, nbytes


def pack_stage_params(stage_params):
    """Flatten each stage's pytree to raw bytes; pad & stack to (S, B) uint8.

    Returns (packed, metas, treedefs): ``packed[r]`` holds stage r's leaves
    back-to-back as bytes; ``metas[r]`` is a list of (offset, shape, dtype)
    (static), ``treedefs[r]`` the stage treedef. This is how heterogeneous
    stage weights get true 1/S residency on a stage-sharded mesh axis: the
    byte rows stack even though the pytrees don't.
    """
    packed_rows, metas, treedefs = [], [], []
    for sp in stage_params:
        leaves, treedef = jax.tree_util.tree_flatten(sp)
        meta, chunks, off = [], [], 0
        for leaf in leaves:
            arr = jnp.asarray(leaf)
            shape, dt, nbytes = _leaf_meta(arr)
            meta.append((off, shape, dt))
            b = jax.lax.bitcast_convert_type(arr.reshape(-1), jnp.uint8)
            chunks.append(b.reshape(-1))
            off += nbytes
        packed_rows.append(jnp.concatenate(chunks) if chunks
                           else jnp.zeros((0,), jnp.uint8))
        metas.append(meta)
        treedefs.append(treedef)
    b_max = max(r.shape[0] for r in packed_rows)
    packed = jnp.stack([
        jnp.pad(r, (0, b_max - r.shape[0])) for r in packed_rows])
    return packed, metas, treedefs


def unpack_stage_params(row: jax.Array, meta, treedef):
    """Inverse of one pack_stage_params row (static offsets: free slicing)."""
    leaves = []
    for off, shape, dt in meta:
        n = 1
        for d in shape:
            n *= d
        nbytes = n * dt.itemsize
        seg = jax.lax.slice(row, (off,), (off + nbytes,))
        if dt.itemsize == 1:
            arr = jax.lax.bitcast_convert_type(seg, dt)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(n, dt.itemsize), dt)
        leaves.append(arr.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def run_pipeline_het(
    stage_fns,                    # list of S fns: (stage_params, x) -> y
    stage_params,                 # list of S pytrees (heterogeneous)
    xs: jax.Array,                # (M, *in0_shape) microbatches
    mesh: Mesh,
):
    """GPipe microbatch pipeline over HETEROGENEOUS stages.

    Stage r's input/output shapes may differ (inferred via eval_shape by
    chaining the stage fns); activations ride a flat max-size carrier of
    the common dtype. Weights: packed byte rows, one per device. Returns
    (M, *out_shape) outputs from the last stage.
    """
    from jax import shard_map

    s = mesh.shape[PIPE_AXIS]
    if len(stage_fns) != s or len(stage_params) != s:
        raise ValueError(f"{len(stage_fns)} stage fns / "
                         f"{len(stage_params)} params != {s} mesh stages")
    m = xs.shape[0]

    # chain shapes through the stages (no execution)
    in_shapes, out_shapes = [], []
    cur = jax.ShapeDtypeStruct(xs.shape[1:], xs.dtype)
    for r in range(s):
        in_shapes.append(cur.shape)
        cur = jax.eval_shape(stage_fns[r], stage_params[r], cur)
        if cur.dtype != xs.dtype:
            raise ValueError(
                f"stage {r} changes carrier dtype {xs.dtype} -> {cur.dtype};"
                " all stages must keep one carrier dtype")
        out_shapes.append(cur.shape)

    import numpy as np

    sizes_in = [int(np.prod(sh)) for sh in in_shapes]
    sizes_out = [int(np.prod(sh)) for sh in out_shapes]
    flat_len = max(sizes_in + sizes_out)
    out_size = sizes_out[-1]

    packed, metas, treedefs = pack_stage_params(stage_params)

    def body(packed_local, xs_flat):
        rank = jax.lax.axis_index(PIPE_AXIS)
        row = packed_local[0]                     # (B,) uint8, MY stage

        def make_branch(r):
            def branch(state):
                p = unpack_stage_params(row, metas[r], treedefs[r])
                x_r = state[:sizes_in[r]].reshape(in_shapes[r])
                y = stage_fns[r](p, x_r).reshape(-1)
                return jnp.pad(y, (0, flat_len - sizes_out[r]))
            return branch

        branches = [make_branch(r) for r in range(s)]

        state = jax.lax.pcast(jnp.zeros((flat_len,), xs_flat.dtype),
                              PIPE_AXIS, to="varying")
        outbuf = jax.lax.pcast(jnp.zeros((m, out_size), xs_flat.dtype),
                               PIPE_AXIS, to="varying")
        shift = [(i, i + 1) for i in range(s - 1)]

        def tick(t, carry):
            state, outbuf = carry
            inp = jax.lax.dynamic_index_in_dim(
                xs_flat, jnp.minimum(t, m - 1), 0, keepdims=False)
            ingest = jnp.logical_and(rank == 0, t < m)
            state = jnp.where(ingest, inp, state)
            y = jax.lax.switch(rank, branches, state)
            mb = t - (s - 1)
            idx = jnp.clip(mb, 0, m - 1)
            emit = jnp.logical_and(rank == s - 1, mb >= 0)
            curo = jax.lax.dynamic_index_in_dim(outbuf, idx, 0,
                                                keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(emit, y[:out_size], curo), idx, 0)
            state = jax.lax.ppermute(y, PIPE_AXIS, shift)
            return state, outbuf

        _, outbuf = jax.lax.fori_loop(0, m + s - 1, tick, (state, outbuf))
        mask = (rank == s - 1).astype(outbuf.dtype)
        return jax.lax.psum(outbuf * mask, PIPE_AXIS)

    xs_flat = xs.reshape(m, -1)
    if xs_flat.shape[1] < flat_len:
        xs_flat = jnp.pad(xs_flat, ((0, 0), (0, flat_len - xs_flat.shape[1])))

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(PIPE_AXIS, None), P()), out_specs=P())
    packed_s = jax.device_put(packed, NamedSharding(mesh, P(PIPE_AXIS, None)))
    out = jax.jit(f)(packed_s,
                     jax.device_put(xs_flat, NamedSharding(mesh, P())))
    return out.reshape((m,) + out_shapes[-1])
