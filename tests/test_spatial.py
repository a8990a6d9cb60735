"""Spatial partitioning (SP) tests: H-sharded convs with halo exchange vs
the unsharded qconv2d, across mesh shapes, chained, and composed with DP.
Oracle convention (CLAUDE.md): int32 accumulation bit-exact; float epilogue
allclose (XLA FMA-contraction differs per program: 7.6e-6 max abs measured);
requantized int8 within |delta| <= 1. Runs on the forced-CPU 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lowbitdnn_project_tpu.ops.conv import qconv2d
from lowbitdnn_project_tpu.parallel import make_mesh
from lowbitdnn_project_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from lowbitdnn_project_tpu.parallel.spatial import (
    halo_exchange_rows, qconv2d_sp, shard_spatial,
)
from lowbitdnn_project_tpu.quant.qtensor import QTensor


def _rand_case(rng, n=2, h=32, w=16, c=8, k=16, kh=3, kw=3):
    x = rng.integers(-127, 128, (n, h, w, c)).astype(np.int8)
    wt = rng.integers(-127, 128, (kh, kw, c, k)).astype(np.int8)
    x_scale = np.float32(0.02)
    w_scale = (0.01 + rng.random(k) * 0.02).astype(np.float32)
    bias = rng.normal(size=(k,)).astype(np.float32)
    return x, wt, x_scale, w_scale, bias


def _qtensors(x, wt, x_scale, w_scale):
    x_q = QTensor(values=jnp.asarray(x), scale=jnp.float32(x_scale))
    w_q = QTensor(values=jnp.asarray(wt),
                  scale=jnp.asarray(w_scale).reshape(1, 1, 1, -1), axis=3)
    return x_q, w_q


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sp_int32_accum_bitexact(sp):
    """The haloed VALID conv == the padded unsharded conv, exactly (int32)."""
    from lowbitdnn_project_tpu.ops.conv import conv2d_int32

    rng = np.random.default_rng(0)
    x, wt, _, _, _ = _rand_case(rng)
    ref = conv2d_int32(jnp.asarray(x), jnp.asarray(wt), (1, 1), (1, 1))

    mesh = make_mesh(dp=8 // sp, tp=sp)

    def body(xx, ww):
        xh = halo_exchange_rows(xx, 1)
        return jax.lax.conv_general_dilated(
            xh, ww, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, MODEL_AXIS, None, None), P()),
                  out_specs=P(None, MODEL_AXIS, None, None))
    got = jax.jit(f)(shard_spatial(jnp.asarray(x), mesh), jnp.asarray(wt))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sp_conv_vs_unsharded(sp):
    rng = np.random.default_rng(0)
    x, wt, x_scale, w_scale, bias = _rand_case(rng)
    x_q, w_q = _qtensors(x, wt, x_scale, w_scale)
    ref = qconv2d(x_q, w_q, jnp.asarray(bias), stride=1, padding=1,
                  relu=True, backend="xla")

    mesh = make_mesh(dp=8 // sp, tp=sp)
    combined = jnp.asarray(x_scale * w_scale)
    f = shard_map(
        lambda xx, ww, ss, bb: qconv2d_sp(xx, ww, ss, bb, relu=True),
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS, None, None), P(), P(), P()),
        out_specs=P(None, MODEL_AXIS, None, None))
    got = jax.jit(f)(shard_spatial(jnp.asarray(x), mesh),
                     jnp.asarray(wt), combined, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_chain_int8():
    """Two requantized SP convs chained WITHOUT re-sharding == the unsharded
    int8 chain within the |delta| <= 1 oracle (epilogue FMA ULP can flip a
    rounding boundary)."""
    rng = np.random.default_rng(1)
    x, w1, x_scale, w1_scale, b1 = _rand_case(rng, k=16)
    w2 = rng.integers(-127, 128, (3, 3, 16, 8)).astype(np.int8)
    w2_scale = (0.01 + rng.random(8) * 0.02).astype(np.float32)
    s_mid, s_out = np.float32(0.05), np.float32(0.07)

    x_q, w1_q = _qtensors(x, w1, x_scale, w1_scale)
    w2_q = QTensor(values=jnp.asarray(w2),
                   scale=jnp.asarray(w2_scale).reshape(1, 1, 1, -1), axis=3)
    mid = qconv2d(x_q, w1_q, jnp.asarray(b1), stride=1, padding=1, relu=True,
                  out_scale=jnp.float32(s_mid), backend="xla")
    ref = qconv2d(mid, w2_q, None, stride=1, padding=1, relu=True,
                  out_scale=jnp.float32(s_out), backend="xla")

    mesh = make_mesh(dp=2, tp=4)
    c1 = jnp.asarray(x_scale * w1_scale)
    c2 = jnp.asarray(s_mid * w2_scale)

    def chain(xx, ww1, ss1, bb1, ww2, ss2):
        h = qconv2d_sp(xx, ww1, ss1, bb1, relu=True,
                       out_scale=jnp.float32(s_mid))
        return qconv2d_sp(h, ww2, ss2, None, relu=True,
                          out_scale=jnp.float32(s_out))

    f = shard_map(
        chain, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS, None, None), P(), P(), P(), P(), P()),
        out_specs=P(None, MODEL_AXIS, None, None))
    got = jax.jit(f)(shard_spatial(jnp.asarray(x), mesh), jnp.asarray(w1),
                     c1, jnp.asarray(b1), jnp.asarray(w2), c2)
    assert got.dtype == jnp.int8
    delta = np.abs(np.asarray(got, np.int32) -
                   np.asarray(ref.values, np.int32))
    assert delta.max() <= 1, delta.max()
    # rounding-boundary flips should be rare, not systematic
    assert (delta > 0).mean() < 0.01, (delta > 0).mean()


def test_sp_composes_with_dp():
    """Batch over DATA x H over MODEL simultaneously — the full SP+DP mesh."""
    rng = np.random.default_rng(2)
    x, wt, x_scale, w_scale, bias = _rand_case(rng, n=4, h=16)
    x_q, w_q = _qtensors(x, wt, x_scale, w_scale)
    ref = qconv2d(x_q, w_q, jnp.asarray(bias), stride=1, padding=1,
                  relu=True, backend="xla")

    mesh = make_mesh(dp=2, tp=4)
    combined = jnp.asarray(x_scale * w_scale)
    f = shard_map(
        lambda xx, ww, ss, bb: qconv2d_sp(xx, ww, ss, bb, relu=True),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS, None, None), P(), P(), P()),
        out_specs=P(DATA_AXIS, MODEL_AXIS, None, None))
    from jax.sharding import NamedSharding
    x_s = jax.device_put(jnp.asarray(x), NamedSharding(
        mesh, P(DATA_AXIS, MODEL_AXIS, None, None)))
    got = jax.jit(f)(x_s, jnp.asarray(wt), combined, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_1x1_no_halo():
    rng = np.random.default_rng(3)
    x, wt, x_scale, w_scale, bias = _rand_case(rng, kh=1, kw=1)
    x_q, w_q = _qtensors(x, wt, x_scale, w_scale)
    ref = qconv2d(x_q, w_q, jnp.asarray(bias), stride=1, padding=0,
                  backend="xla")

    mesh = make_mesh(dp=1, tp=8)
    combined = jnp.asarray(x_scale * w_scale)
    f = shard_map(
        lambda xx, ww, ss, bb: qconv2d_sp(xx, ww, ss, bb),
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS, None, None), P(), P(), P()),
        out_specs=P(None, MODEL_AXIS, None, None))
    got = jax.jit(f)(shard_spatial(jnp.asarray(x), mesh),
                     jnp.asarray(wt), combined, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_halo_exchange_matches_pad():
    """halo_exchange_rows over the full mesh == zero-padding the H axis."""
    rng = np.random.default_rng(4)
    x = rng.integers(-127, 128, (1, 16, 8, 8)).astype(np.int8)
    mesh = make_mesh(dp=1, tp=8)
    f = shard_map(lambda xx: halo_exchange_rows(xx, 2), mesh=mesh,
                  in_specs=P(None, MODEL_AXIS, None, None),
                  out_specs=P(None, MODEL_AXIS, None, None))
    got = np.asarray(jax.jit(f)(shard_spatial(jnp.asarray(x), mesh)))
    # per-shard (Hl=2, halo=2): shard r holds [above2, local2, below2] = 6
    # rows; stitched output interleaves them — check each shard slice.
    padded = np.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    for r in range(8):
        np.testing.assert_array_equal(
            got[:, 6 * r:6 * (r + 1)], padded[:, 2 * r:2 * r + 6])


def test_sp_errors():
    mesh = make_mesh(dp=1, tp=8)
    with pytest.raises(ValueError, match="divisible"):
        shard_spatial(jnp.zeros((1, 12, 8, 8), jnp.int8), mesh)
    # even kernel height
    with pytest.raises(ValueError, match="odd"):
        f = shard_map(
            lambda xx, ww: qconv2d_sp(xx, ww, jnp.float32(1.0)),
            mesh=mesh,
            in_specs=(P(None, MODEL_AXIS, None, None), P()),
            out_specs=P(None, MODEL_AXIS, None, None))
        f(jnp.zeros((1, 16, 8, 8), jnp.int8),
          jnp.zeros((2, 3, 8, 8), jnp.int8))
    # halo wider than the local shard
    with pytest.raises(ValueError, match="halo"):
        f = shard_map(
            lambda xx, ww: qconv2d_sp(xx, ww, jnp.float32(1.0)),
            mesh=mesh,
            in_specs=(P(None, MODEL_AXIS, None, None), P()),
            out_specs=P(None, MODEL_AXIS, None, None))
        f(jnp.zeros((1, 8, 8, 8), jnp.int8),   # Hl=1 < halo=2
          jnp.zeros((5, 5, 8, 8), jnp.int8))
