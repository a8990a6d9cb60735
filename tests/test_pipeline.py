"""Pipeline-parallel (PP) tests: the microbatch pipeline over the stage
axis matches running the stage tower sequentially. Integer blocks are
bit-exact; blocks with a float requant epilogue follow the |delta| <= 1
oracle (CLAUDE.md). Runs on the forced-CPU 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.parallel.pipeline import (
    make_pipeline_mesh, pipeline_apply, run_pipeline, shard_stage_params,
)


def _int8_block(params, x):
    """Homogeneous residual-tower stage: int8 conv 3x3 SAME + requant."""
    w, scale = params
    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    q = jnp.round(acc.astype(jnp.float32) * scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _sequential(block_fn, params_stacked, xs):
    s = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]
    out = xs
    for r in range(s):
        p_r = jax.tree_util.tree_map(lambda a: a[r], params_stacked)
        out = jnp.stack([block_fn(p_r, out[i]) for i in range(out.shape[0])])
    return out


@pytest.mark.parametrize("stages,micro", [(2, 4), (4, 8), (8, 8), (4, 1)])
def test_pipeline_matches_sequential_int8(stages, micro):
    rng = np.random.default_rng(0)
    c = 8
    ws = rng.integers(-8, 9, (stages, 3, 3, c, c)).astype(np.int8)
    scales = np.full((stages, 1), 2e-3, np.float32)
    params = (jnp.asarray(ws), jnp.asarray(scales))
    xs = jnp.asarray(rng.integers(-127, 128, (micro, 2, 8, 8, c)), jnp.int8)

    ref = _sequential(lambda p, x: _int8_block((p[0], p[1][0]), x),
                      params, xs)
    mesh = make_pipeline_mesh(stages)
    got = run_pipeline(lambda p, x: _int8_block((p[0], p[1][0]), x),
                       params, xs, mesh)
    delta = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert delta.max() <= 1, delta.max()
    assert (delta > 0).mean() < 0.01


def test_pipeline_float_block_bitexact():
    """A pure-linear float block is bit-identical (same per-stage program)."""
    rng = np.random.default_rng(1)
    stages, micro, d = 4, 6, 16
    ws = jnp.asarray(rng.normal(size=(stages, d, d)) * 0.3, jnp.float32)
    xs = jnp.asarray(rng.normal(size=(micro, 3, d)), jnp.float32)
    block = lambda p, x: jnp.tanh(x @ p)

    ref = _sequential(lambda p, x: block(p[0], x), (ws,), xs)
    got = run_pipeline(lambda p, x: block(p[0], x), (ws,),
                       xs, make_pipeline_mesh(stages))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pipeline_errors():
    mesh = make_pipeline_mesh(4)
    ws = jnp.zeros((3, 8, 8), jnp.float32)       # 3 stages != 4 devices
    with pytest.raises(ValueError, match="leading axis"):
        shard_stage_params((ws,), mesh)
    with pytest.raises(ValueError, match="devices"):
        make_pipeline_mesh(64)
    # shape-changing block rejected
    ws4 = jnp.zeros((4, 8, 4), jnp.float32)
    xs = jnp.zeros((2, 3, 8), jnp.float32)
    with pytest.raises(ValueError, match="preserve shape"):
        run_pipeline(lambda p, x: x @ p[0], (ws4,), xs, mesh)
