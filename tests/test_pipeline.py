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


# ----------------------------------------------- heterogeneous pipeline

def test_pack_unpack_stage_params_roundtrip():
    from lowbitdnn_project_tpu.parallel.pipeline import (
        pack_stage_params, unpack_stage_params)

    rng = np.random.default_rng(3)
    stages = [
        {"w": jnp.asarray(rng.integers(-8, 9, (3, 3, 4, 8)), jnp.int8),
         "s": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        {"w": jnp.asarray(rng.integers(-8, 9, (1, 1, 8, 16)), jnp.int8),
         "s": jnp.asarray(rng.normal(size=(16,)), jnp.float32),
         "zp": jnp.asarray(-128, jnp.int32)},
    ]
    packed, metas, treedefs = pack_stage_params(stages)
    assert packed.dtype == jnp.uint8 and packed.shape[0] == 2
    for r, sp in enumerate(stages):
        back = unpack_stage_params(packed[r], metas[r], treedefs[r])
        for k in sp:
            np.testing.assert_array_equal(np.asarray(back[k]),
                                          np.asarray(sp[k]))


def test_het_pipeline_changing_shapes_bit_exact():
    """Stages with DIFFERENT channel widths and spatial dims (stride-2
    downsample between stages) — the case run_pipeline cannot express."""
    from lowbitdnn_project_tpu.parallel.pipeline import run_pipeline_het

    rng = np.random.default_rng(4)
    chans = [8, 16, 32, 64]

    def make_stage(cin, cout):
        w = jnp.asarray(rng.integers(-5, 6, (3, 3, cin, cout)), jnp.int8)
        sc = jnp.asarray(2e-3, jnp.float32)

        def fn(p, x):
            ww, s = p
            acc = jax.lax.conv_general_dilated(
                x, ww, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            q = jnp.round(acc.astype(jnp.float32) * s)
            return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

        return fn, (w, sc)

    fns, ps = zip(*[make_stage(chans[i], chans[i + 1]) for i in range(3)])
    xs = jnp.asarray(rng.integers(-127, 128, (6, 2, 16, 16, chans[0])),
                     jnp.int8)
    ref = xs
    seq = []
    for i in range(xs.shape[0]):
        h = xs[i]
        for r in range(3):
            h = fns[r](ps[r], h)
        seq.append(h)
    ref = jnp.stack(seq)

    mesh = make_pipeline_mesh(3)
    got = run_pipeline_het(list(fns), list(ps), xs, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resnet_pipelined_int8chain_matches_sequential():
    """A real model (bottleneck ResNet) through the 4-stage pipeline: the
    pipelined logits must be bit-identical to apply_quantized_int8chain
    (static scales => per-example compute is batch-independent)."""
    from lowbitdnn_project_tpu.models import resnet

    rng = np.random.default_rng(5)
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    qp = resnet.quantize_params(params, cfg)

    ref = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla",
                                           stem_backend="classic")
    mesh = make_pipeline_mesh(4)
    got = resnet.apply_pipelined_int8chain(qp, x, scales, cfg, mesh,
                                           microbatches=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resnet_pipelined_microbatch_counts():
    from lowbitdnn_project_tpu.models import resnet

    rng = np.random.default_rng(6)
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=False,
                              num_classes=10, width=8)
    params = resnet.init_params(jax.random.key(1), cfg)
    x = jnp.asarray(rng.normal(size=(6, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    qp = resnet.quantize_params(params, cfg)
    ref = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla",
                                           stem_backend="classic")
    mesh = make_pipeline_mesh(4)
    for m in (2, 6):
        got = resnet.apply_pipelined_int8chain(qp, x, scales, cfg, mesh,
                                               microbatches=m)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
