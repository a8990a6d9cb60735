"""Fused Pallas Winograd kernel tests (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.winograd_fused import conv3x3_winograd_fused
from lowbitdnn_project_tpu.ops import conv2d_int32
from lowbitdnn_project_tpu.ops.winograd import wino_quantize_filter
from lowbitdnn_project_tpu.quant import QTensor


def _setup(rng, n=1, h=8, w=8, c=128, k=128):
    x = jnp.asarray(rng.integers(-50, 51, (n, h, w, c)), jnp.int8)
    wt = QTensor(values=jnp.asarray(rng.integers(-50, 51, (3, 3, c, k)),
                                    jnp.int8),
                 scale=jnp.asarray(0.05, jnp.float32))
    xs = jnp.asarray(0.1, jnp.float32)
    acc = conv2d_int32(x, wt.values, (1, 1), (1, 1))
    want = np.asarray(acc, np.float64) * 0.1 * 0.05
    return x, wt, xs, want


def test_fused_int16_mode_exact(rng):
    x, wt, xs, want = _setup(rng)
    u, us = wino_quantize_filter(wt, mode="int16")
    got = conv3x3_winograd_fused(x, u, us, xs, v_int8=False, bh=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-4, atol=1e-3)


def test_fused_int8_mode_error_bounded(rng):
    x, wt, xs, want = _setup(rng)
    u, us = wino_quantize_filter(wt, mode="int8")
    got = conv3x3_winograd_fused(x, u, us, xs, v_int8=True, bh=4,
                                 interpret=True)
    rel = np.linalg.norm(np.asarray(got, np.float64) - want) / np.linalg.norm(want)
    assert rel < 0.06, rel


def test_fused_epilogue_requant(rng):
    x, wt, xs, want = _setup(rng, h=4, w=4)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    u, us = wino_quantize_filter(wt, mode="int16")
    out = conv3x3_winograd_fused(x, u, us, xs, bias, jnp.asarray(0.5),
                                 relu=True, requant=True, v_int8=False,
                                 bh=4, interpret=True)
    assert out.dtype == jnp.int8
    want_q = np.clip(np.round(np.maximum(want + np.asarray(bias), 0) / 0.5),
                     -127, 127)
    d = np.abs(np.asarray(out, np.float64) - want_q)
    assert d.max() <= 1


def test_fused_rect_and_multibatch(rng):
    x, wt, xs, want = _setup(rng, n=2, h=8, w=12)
    u, us = wino_quantize_filter(wt, mode="int16")
    got = conv3x3_winograd_fused(x, u, us, xs, v_int8=False, bh=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-4, atol=1e-3)
