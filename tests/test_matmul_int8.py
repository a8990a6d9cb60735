"""Pallas int8 GEMM kernel vs XLA int32 oracle — bit-exact.

Exact-match testing strategy from the reference (check.cu:117-129): integer
inputs, integer accumulation, assert zero difference.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.matmul_int8 import (
    int8_matmul_fused,
    int8_matmul_xla,
)

SHAPES = [
    (8, 16, 32),        # tiny, sub-tile everything
    (32, 128, 128),     # single tile
    (64, 256, 384),     # multi-tile K
    (100, 130, 260),    # unaligned everything
    (1, 64, 64),        # single row
]


def _rand(rng, shape):
    return jnp.asarray(rng.integers(-127, 128, size=shape), jnp.int8)


@pytest.mark.parametrize("m,k,n", SHAPES, ids=lambda v: str(v))
def test_matmul_float_out_exact(rng, m, k, n):
    a, b = _rand(rng, (m, k)), _rand(rng, (k, n))
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    got = int8_matmul_fused(a, b, scale, bias, interpret=True)
    want = int8_matmul_xla(a, b, scale, bias)
    # float epilogue may differ by FMA contraction (1 ulp); the integer
    # accumulation itself is bit-exact (see int32 exactness test below)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize("m,k,n", SHAPES[:3], ids=lambda v: str(v))
def test_matmul_relu_requant_exact(rng, m, k, n):
    a, b = _rand(rng, (m, k)), _rand(rng, (k, n))
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    out_scale = jnp.asarray(0.37, jnp.float32)
    got = int8_matmul_fused(a, b, scale, bias, out_scale,
                            relu=True, requant=True, interpret=True)
    want = int8_matmul_xla(a, b, scale, bias, out_scale,
                           relu=True, requant=True)
    assert got.dtype == jnp.int8
    # reference tolerance for requantized outputs: |delta| <= 1
    # (python/qtorch/tests/main.py:88-93); FMA ulp can flip a round tie
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_matmul_per_tensor_scale(rng):
    a, b = _rand(rng, (16, 64)), _rand(rng, (64, 32))
    got = int8_matmul_fused(a, b, jnp.asarray(0.05), interpret=True)
    want = int8_matmul_xla(a, b, jnp.full((32,), 0.05, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_matmul_int32_exactness_large_accumulation(rng):
    # K=1024 of ±127 products: |acc| up to ~16.5M, well within int32 —
    # verify no precision loss vs a float64 numpy oracle.
    a, b = _rand(rng, (8, 1024)), _rand(rng, (1024, 128))
    got = int8_matmul_fused(a, b, jnp.asarray(1.0), interpret=True)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_array_equal(np.asarray(got, np.float64), want)
