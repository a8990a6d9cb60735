"""Fused stem+pool kernel vs the XLA conv+pool chain (interpret mode).

Oracle: qconv2d(7x7, s2, p3, relu, out_scale) + qmax_pool2d(3, 2, 1) — the
path apply_quantized_int8chain uses (models/resnet.py). The fused kernel
must match within |delta| <= 1 (requant rounding at half-ulp boundaries);
pooled maxes of matching int8 inputs are exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.quant import quantize
from lowbitdnn_project_tpu.ops import qconv2d, qmax_pool2d
from lowbitdnn_project_tpu.kernels.stem_fused import (
    stem_conv_pool_fused, stem_plane_input, stem_plane_filter)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _reference(x_q, w_q, bias, out_scale, relu=True):
    y = qconv2d(x_q, w_q, bias, stride=2, padding=3, relu=relu,
                out_scale=out_scale, backend="xla")
    return qmax_pool2d(y, ksize=3, stride=2, padding=1)


def test_plane_input_layout(rng):
    x = jnp.asarray(rng.integers(-127, 128, (1, 224, 224, 3)), jnp.int8)
    planes = stem_plane_input(x)
    assert planes.shape == (1, 232, 8, 128)
    xp = np.pad(np.asarray(x), ((0, 0), (3, 5), (3, 29), (0, 1)))
    merged = xp.reshape(1, 232, 1024)
    got = np.asarray(planes)
    for (u, p, j) in [(0, 0, 0), (5, 3, 17), (231, 7, 127), (100, 2, 56)]:
        assert got[0, u, p, j] == merged[0, u, 8 * j + p], (u, p, j)


@pytest.mark.parametrize("version", [1, 2, 3])
def test_stem_fused_matches_chain(rng, version):
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32) * 2)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.5)
    x_q = quantize(x, bits=8)
    w_q = quantize(w, bits=8, axis=3)
    out_scale = 0.05

    ref = _reference(x_q, w_q, bias, out_scale)
    got = stem_conv_pool_fused(x_q, w_q, bias, out_scale, interpret=True,
                               version=version)

    assert got.values.shape == ref.values.shape == (2, 56, 56, 64)
    delta = np.abs(np.asarray(got.values, np.int32)
                   - np.asarray(ref.values, np.int32))
    assert delta.max() <= 1, f"max |delta| {delta.max()}"
    assert (delta > 0).mean() < 1e-3, f"mismatch rate {(delta > 0).mean()}"


@pytest.mark.parametrize("version", [1, 2, 3])
def test_stem_fused_no_bias_no_relu(rng, version):
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    x_q = quantize(x, bits=8)
    w_q = quantize(w, bits=8, axis=3)
    ref = _reference(x_q, w_q, None, 0.08, relu=False)
    got = stem_conv_pool_fused(x_q, w_q, None, 0.08, relu=False,
                               interpret=True, version=version)
    delta = np.abs(np.asarray(got.values, np.int32)
                   - np.asarray(ref.values, np.int32))
    assert delta.max() <= 1, f"max |delta| {delta.max()}"


def test_plane_input6_layout(rng):
    """v3 flat 6-plane prep: planes[n, 6u+p, j] = merged byte 6j+p of
    padded row u, merged byte 3w'+c (no pad channel)."""
    from lowbitdnn_project_tpu.kernels.stem_fused import stem_plane_input6

    x = jnp.asarray(rng.integers(-100, 101, (1, 224, 224, 3)), jnp.int8)
    planes = stem_plane_input6(x)
    assert planes.shape == (1, 232 * 6, 128)
    xp = np.asarray(jnp.pad(x, ((0, 0), (3, 5), (3, 29), (0, 0))))
    merged = xp.reshape(1, 232, 768)
    pn = np.asarray(planes).reshape(1, 232, 6, 128)
    for u in (0, 3, 100, 231):
        for p in (0, 1, 5):
            for j in (0, 7, 113, 127):
                assert pn[0, u, p, j] == merged[0, u, 6 * j + p], (u, p, j)
