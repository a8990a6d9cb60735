"""s2d stem (ops/stem.py) must be bit-exact vs the classic 7x7+pool path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.ops import qconv2d, qmax_pool2d
from lowbitdnn_project_tpu.ops.stem import (
    pool_s2d_phases,
    s2d_stem_filter,
    space_to_depth_input,
    stem_conv_pool_s2d,
)
from lowbitdnn_project_tpu.quant.qtensor import QTensor


def _mk_inputs(seed=0, n=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-127, 128, (n, 224, 224, 3)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (7, 7, 3, 64)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (1, 1, 1, 64)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    x_q = QTensor(values=x, scale=jnp.float32(0.02))
    w_q = QTensor(values=w, scale=ws, bits=8, axis=3)
    return x_q, w_q, bias


def test_s2d_filter_mac_count():
    """Exactly the 49 real taps survive per (c, k) pair across all phases."""
    w = jnp.ones((7, 7, 3, 64), jnp.int8)
    w2 = s2d_stem_filter(w)
    assert w2.shape == (3, 3, 48, 256)
    # each of the 4 output phases must see all 49 taps of each input channel
    per_out = np.asarray(w2, np.int32).sum(axis=(0, 1, 2)).reshape(2, 2, 64)
    assert (per_out == 49 * 3).all()


def test_s2d_fold_shapes():
    x = jnp.zeros((2, 224, 224, 3), jnp.int8)
    assert space_to_depth_input(x).shape == (2, 58, 58, 48)


def test_stem_bitexact_vs_classic():
    x_q, w_q, bias = _mk_inputs()
    out_scale = jnp.float32(0.05)

    ref = qconv2d(x_q, w_q, bias, stride=2, padding=3, relu=True,
                  out_scale=out_scale, backend="xla")
    ref = qmax_pool2d(ref, 3, 2, 1)

    got = stem_conv_pool_s2d(x_q, w_q, bias, out_scale, relu=True)

    assert got.shape == (2, 56, 56, 64)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(ref.values))
    np.testing.assert_allclose(float(got.scale), float(ref.scale))


def test_pool_s2d_matches_reduce_window():
    """Phase-domain pool == reduce_window pool on the unfolded image."""
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.integers(-127, 128, (2, 112, 112, 64)), jnp.int8)
    ref = qmax_pool2d(QTensor(values=v, scale=jnp.float32(1.0)), 3, 2, 1)
    # fold to 2x2 s2d: (N,56,56,(py,px,k))
    f = v.reshape(2, 56, 2, 56, 2, 64).transpose(0, 1, 3, 2, 4, 5)
    f = f.reshape(2, 56, 56, 256)
    got = pool_s2d_phases(f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.values))
