"""Quantized conv tests — the oracle pyramid from SURVEY.md §4:

  1. numpy int32 loop-nest conv (analogue of cpp/int8conv/refConv2DForward.hpp)
  2. XLA int8 conv with int32 accumulation (conv2d_int32)
  3. Pallas im2col-GEMM path (interpret mode on CPU)

All three must agree bit-exactly on the integer accumulator; quantized
outputs within |delta| <= 1 (reference tests/main.py:88-93).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.ops import conv2d_int32, im2col, qconv2d, qmax_pool2d
from lowbitdnn_project_tpu.quant import QTensor, quantize

from conftest import integer_valued


def ref_conv2d_int32(x, w, stride, padding, groups=1):
    """7-loop numpy int32 NHWC conv — trusted slow oracle
    (reference refConv2DForward.hpp:15-53 re-expressed in NHWC)."""
    n, h, wd, c = x.shape
    kh, kw, wc, k = w.shape
    sh, sw = stride
    ph, pw = padding
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (wd + 2 * pw - kw) // sw + 1
    xp = np.zeros((n, h + 2 * ph, wd + 2 * pw, c), np.int32)
    xp[:, ph:ph + h, pw:pw + wd, :] = x
    out = np.zeros((n, oh, ow, k), np.int32)
    cg = c // groups
    kg = k // groups
    for b in range(n):
        for oy in range(oh):
            for ox in range(ow):
                for ko in range(k):
                    g = ko // kg
                    acc = 0
                    for ky in range(kh):
                        for kx in range(kw):
                            for ci in range(wc):
                                acc += int(xp[b, oy * sh + ky, ox * sw + kx,
                                              g * cg + ci]) * int(w[ky, kx, ci, ko])
                    out[b, oy, ox, ko] = acc
    return out


def _qt(arr, scale=1.0, axis=None):
    arr = np.asarray(arr)
    sshape = () if axis is None else tuple(
        arr.shape[i] if i == axis % arr.ndim else 1 for i in range(arr.ndim))
    return QTensor(values=jnp.asarray(arr, jnp.int8),
                   scale=jnp.full(sshape, scale, jnp.float32),
                   bits=8, axis=axis)


def test_conv_int32_matches_numpy_oracle(rng, conv_shape):
    n, c, k, h, w, f, s, p = conv_shape
    x = rng.integers(-50, 51, size=(n, h, w, c)).astype(np.int8)
    wt = rng.integers(-50, 51, size=(f, f, c, k)).astype(np.int8)
    got = np.asarray(conv2d_int32(jnp.asarray(x), jnp.asarray(wt),
                                  (s, s), (p, p)))
    want = ref_conv2d_int32(x, wt, (s, s), (p, p))
    np.testing.assert_array_equal(got, want)


def test_gemm_path_matches_xla_path(rng, conv_shape):
    n, c, k, h, w, f, s, p = conv_shape
    x = _qt(rng.integers(-50, 51, size=(n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, size=(f, f, c, k)), scale=0.02, axis=3)
    bias = jnp.asarray(rng.normal(size=(k,)), jnp.float32)
    got = qconv2d(x, wt, bias, stride=s, padding=p, relu=True,
                  backend="gemm", interpret=True)
    want = qconv2d(x, wt, bias, stride=s, padding=p, relu=True, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backend_xla_gemm_bit_exact(rng):
    """backend='xla_gemm' (1x1 conv as dot_general) must be BIT-exact vs the
    conv emitter — same int32 accumulation, same epilogue code. On non-1x1
    shapes the backend must fall through to the conv path unchanged."""
    x = _qt(rng.integers(-50, 51, size=(2, 8, 8, 32)), scale=0.1)
    w1 = _qt(rng.integers(-50, 51, size=(1, 1, 32, 16)), scale=0.02, axis=3)
    w3 = _qt(rng.integers(-50, 51, size=(3, 3, 32, 16)), scale=0.02, axis=3)
    bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    for wt, pad in ((w1, 0), (w3, 1)):
        for kw in ({}, {"relu": True},
                   {"relu": True, "out_scale": jnp.float32(0.5)}):
            got = qconv2d(x, wt, bias, stride=1, padding=pad,
                          backend="xla_gemm", **kw)
            want = qconv2d(x, wt, bias, stride=1, padding=pad,
                           backend="xla", **kw)
            gv = got.values if isinstance(got, QTensor) else got
            wv = want.values if isinstance(want, QTensor) else want
            np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


def test_requant_output_within_one(rng):
    n, c, k, h, w, f, s, p = 2, 8, 16, 8, 8, 3, 1, 1
    x = _qt(rng.integers(-50, 51, size=(n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, size=(f, f, c, k)), scale=0.02, axis=3)
    out_scale = jnp.asarray(0.5, jnp.float32)
    got = qconv2d(x, wt, stride=s, padding=p, out_scale=out_scale,
                  backend="gemm", interpret=True)
    want = qconv2d(x, wt, stride=s, padding=p, out_scale=out_scale,
                   backend="xla")
    assert isinstance(got, QTensor) and got.values.dtype == jnp.int8
    d = np.abs(np.asarray(got.values, np.int32) - np.asarray(want.values, np.int32))
    assert d.max() <= 1


def test_exact_match_float_vs_quantized(rng):
    """The reference's load-bearing test (check.cu:117-129): integer-valued
    float inputs with scale 1 — quantized conv must equal float conv exactly."""
    n, c, k, h, w = 1, 8, 8, 8, 8
    xf = integer_valued(rng, (n, h, w, c), -5, 5)
    wf = integer_valued(rng, (3, 3, c, k), -5, 5)
    # pin absmax so dynamic scales come out as exact power ratios
    xf[0, 0, 0, 0] = 127.0
    wf[0, 0, 0, 0] = 127.0
    x_q = quantize(jnp.asarray(xf))
    w_q = quantize(jnp.asarray(wf))  # per-tensor: pinned absmax -> scale 1
    got = qconv2d(x_q, w_q, stride=1, padding=1, backend="xla")
    want = np.asarray(
        jnp.asarray(
            ref_conv2d_int32(xf.astype(np.int32), wf.astype(np.int32),
                             (1, 1), (1, 1)), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_depthwise_groups(rng):
    n, c, h, w, f = 2, 8, 6, 6, 3
    x = rng.integers(-20, 21, size=(n, h, w, c)).astype(np.int8)
    wt = rng.integers(-20, 21, size=(f, f, 1, c)).astype(np.int8)
    got = np.asarray(conv2d_int32(jnp.asarray(x), jnp.asarray(wt),
                                  (1, 1), (1, 1), groups=c))
    want = ref_conv2d_int32(x, wt, (1, 1), (1, 1), groups=c)
    np.testing.assert_array_equal(got, want)


def test_im2col_shapes_and_content(rng):
    x = jnp.asarray(rng.integers(-5, 6, size=(1, 5, 5, 2)), jnp.int8)
    patches, (oh, ow) = im2col(x, (3, 3), (1, 1), (1, 1))
    assert patches.shape == (1, 5, 5, 18)
    # center tap of the (1,1) output == x[0,1,1,:] (tap index kh=1,kw=1)
    center = patches[0, 1, 1, (1 * 3 + 1) * 2:(1 * 3 + 1) * 2 + 2]
    np.testing.assert_array_equal(np.asarray(center), np.asarray(x[0, 1, 1]))


def test_qmax_pool_matches_float(rng):
    x = _qt(rng.integers(-50, 51, size=(2, 8, 8, 4)), scale=0.25)
    got = qmax_pool2d(x, 2, 2)
    xf = np.asarray(x.values, np.float32) * 0.25
    want = np.max(
        xf.reshape(2, 4, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4, 5), axis=(3, 4))
    np.testing.assert_allclose(np.asarray(got.dequantize()), want)


def test_backend_direct_matches_xla(rng):
    n, c, k, h, w = 1, 128, 128, 8, 8
    x = _qt(rng.integers(-50, 51, size=(n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, size=(3, 3, c, k)), scale=0.02, axis=3)
    got = qconv2d(x, wt, stride=1, padding=1, relu=True, backend="direct",
                  interpret=True)
    want = qconv2d(x, wt, stride=1, padding=1, relu=True, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_backend_winograd_tracks_xla(rng):
    n, c, k, h, w = 1, 128, 128, 8, 8
    x = _qt(rng.integers(-50, 51, size=(n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, size=(3, 3, c, k)), scale=0.02, axis=3)
    got = qconv2d(x, wt, stride=1, padding=1, backend="winograd",
                  interpret=True)
    want = qconv2d(x, wt, stride=1, padding=1, backend="xla")
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.06, rel


def test_direct_v2_matches_oracle(rng):
    from lowbitdnn_project_tpu.kernels.conv_direct2 import conv2d_direct_v2

    x = jnp.asarray(rng.integers(-50, 51, (2, 8, 8, 128)), jnp.int8)
    w = jnp.asarray(rng.integers(-50, 51, (3, 3, 128, 64)), jnp.int8)
    s = jnp.full((64,), 0.01, jnp.float32)
    got = conv2d_direct_v2(x, w, s, relu=True, bh=4, interpret=True)
    want = jnp.maximum(
        conv2d_int32(x, w, (1, 1), (1, 1)).astype(jnp.float32) * s, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_dilated_conv_matches_oracle(rng):
    """Dilation support — the reference marks dilation != 1 xfail
    (conftest.py:36); here it works via rhs_dilation."""
    x = rng.integers(-20, 21, (1, 10, 10, 4)).astype(np.int8)
    w = rng.integers(-20, 21, (3, 3, 4, 8)).astype(np.int8)
    got = np.asarray(conv2d_int32(jnp.asarray(x), jnp.asarray(w),
                                  (1, 1), (2, 2), dilation=(2, 2)))
    # numpy oracle with dilation: insert zeros into the kernel
    wd = np.zeros((5, 5, 4, 8), np.int8)
    wd[::2, ::2] = w
    want = ref_conv2d_int32(x, wd, (1, 1), (2, 2))
    np.testing.assert_array_equal(got, want)
