"""Quantized Winograd F(2x2,3x3) tests.

int16 mode must be BIT-EXACT vs the direct int32 conv (all transforms are
integer butterflies; 4*GgGᵀ is integer for integer filters). int8 mode
(requantized transform domain) must stay within the reference-style error
envelope (the reason the reference gates Winograd with the weights.py range
analysis).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.ops import conv2d_int32
from lowbitdnn_project_tpu.ops.winograd import (
    filter_transform,
    qconv2d_winograd,
    wino_quantize_filter,
)
from lowbitdnn_project_tpu.quant import QTensor


def _qt(arr, scale=1.0, axis=None):
    arr = np.asarray(arr)
    sshape = () if axis is None else tuple(
        arr.shape[i] if i == axis % arr.ndim else 1 for i in range(arr.ndim))
    return QTensor(values=jnp.asarray(arr, jnp.int8),
                   scale=jnp.full(sshape, scale, jnp.float32), axis=axis)


def test_filter_transform_matches_manual():
    # F(2,3) on a delta filter: GgGᵀ of e11 = outer(G[:,1], G[:,1])
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0
    u = np.asarray(filter_transform(jnp.asarray(w)))[:, :, 0, 0]
    g1 = np.asarray([0, 0.5, -0.5, 0])
    np.testing.assert_allclose(u, np.outer(g1, g1))


@pytest.mark.parametrize("shape", [(1, 8, 8, 8, 8), (2, 12, 10, 16, 8)],
                         ids=["small", "rect"])
def test_int16_mode_bit_exact(rng, shape):
    n, h, w, c, k = shape
    x = _qt(rng.integers(-50, 51, (n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, (3, 3, c, k)), scale=0.05)
    u, us = wino_quantize_filter(wt, mode="int16")
    got = qconv2d_winograd(x, u, us, mode="int16")
    acc = conv2d_int32(x.values, wt.values, (1, 1), (1, 1))
    want = acc.astype(jnp.float32) * (0.1 * 0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_int8_mode_error_bounded(rng):
    n, h, w, c, k = 2, 8, 8, 32, 16
    x = _qt(rng.integers(-50, 51, (n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, (3, 3, c, k)), scale=0.05)
    u, us = wino_quantize_filter(wt, mode="int8")
    got = qconv2d_winograd(x, u, us, mode="int8")
    acc = conv2d_int32(x.values, wt.values, (1, 1), (1, 1))
    want = np.asarray(acc.astype(jnp.float32) * (0.1 * 0.05))
    rel = np.linalg.norm(np.asarray(got) - want) / np.linalg.norm(want)
    assert rel < 0.05, rel   # transform-domain requant noise, small


def test_epilogue_relu_bias_requant(rng):
    n, h, w, c, k = 1, 8, 8, 8, 8
    x = _qt(rng.integers(-50, 51, (n, h, w, c)), scale=0.1)
    wt = _qt(rng.integers(-50, 51, (3, 3, c, k)), scale=0.05)
    bias = jnp.asarray(rng.normal(size=(k,)), jnp.float32)
    u, us = wino_quantize_filter(wt, mode="int16")
    out = qconv2d_winograd(x, u, us, bias, relu=True,
                           out_scale=jnp.asarray(0.3), mode="int16")
    assert isinstance(out, QTensor) and out.values.dtype == jnp.int8
    acc = conv2d_int32(x.values, wt.values, (1, 1), (1, 1))
    want_f = jnp.maximum(acc.astype(jnp.float32) * 0.005 + bias, 0)
    want = np.clip(np.round(np.asarray(want_f) / 0.3), -127, 127)
    d = np.abs(np.asarray(out.values, np.int32) - want.astype(np.int32))
    assert d.max() <= 1


def test_int4_weight_winograd_path(rng):
    """BASELINE config 5: INT4 weight-only storage + INT8 activations +
    Winograd INT8 3x3. Weights live nibble-packed (checkpoint format),
    unpack to int8 values in [-7, 7], transform into the Winograd domain,
    and run the int8 winograd conv — error bounded like the int8 mode."""
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.int4 import pack_int4, unpack_int4

    n, h, w, c, k = 2, 8, 8, 32, 16
    wf = jnp.asarray(rng.normal(size=(3, 3, c, k)) * 0.2, jnp.float32)
    w4 = quantize(wf, bits=4, axis=3)               # int4 values, int8 store
    packed = pack_int4(w4.values)                   # (3,3,c,k//2) nibbles
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 3, c, k // 2)
    restored = QTensor(values=unpack_int4(packed), scale=w4.scale,
                       bits=4, axis=3)
    np.testing.assert_array_equal(np.asarray(restored.values),
                                  np.asarray(w4.values))

    x = _qt(rng.integers(-50, 51, (n, h, w, c)), scale=0.1)
    u, us = wino_quantize_filter(
        QTensor(values=restored.values, scale=restored.scale, bits=8,
                axis=3), mode="int8")
    got = qconv2d_winograd(x, u, us, mode="int8")
    acc = conv2d_int32(x.values, restored.values, (1, 1), (1, 1))
    want = np.asarray(acc.astype(jnp.float32) * 0.1 * np.asarray(
        restored.scale).reshape(1, 1, 1, k))
    rel = np.linalg.norm(np.asarray(got) - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_chain_wino_mode_routes_and_tracks(rng):
    """apply_quantized_int8chain(wino_mode=...): int16 mode (exact integer
    Winograd) tracks the xla chain closely; int8 mode stays bounded. The
    range report covers every routed 3x3 layer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lowbitdnn_project_tpu.models import resnet
    from lowbitdnn_project_tpu.ops.winograd import wino_range_report

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    qp = resnet.quantize_params(params, cfg)
    base = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla")
    w16 = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla",
                                           wino_mode="int16")
    w8 = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla",
                                          wino_mode="int8")
    bn = float(jnp.linalg.norm(base))
    e16 = float(jnp.linalg.norm(w16 - base)) / bn
    e8 = float(jnp.linalg.norm(w8 - base)) / bn
    # int16 transform domain is exact; only requant rounding at block
    # boundaries can differ by the |d|<=1 oracle's worth
    assert e16 < 0.05, e16
    assert e8 < 0.25, e8
    rep = wino_range_report(qp)
    # every 3x3 conv layer reported (bottleneck conv2 of each block; the
    # 7x7 stem and 1x1s are not Winograd material)
    assert any("conv2" in k for k in rep), rep.keys()
    for row in rep.values():
        assert 0.9 <= row["sigma4_cover_min"] <= 1.0
        assert row["u_int8_relerr"] < 0.05
