"""Asymmetric ("uint8") activation quantization tests.

Reference parity target: the uint8 activation path — fused uint8 quantize
in cpp/int8conv/conv2DForward3x3Fused.cuh:15-60 and the uint8x4/uint8x4_ext
benchmark configs (cpp/apps/config.json:55-80). TPU formulation: int8
storage + zero_point=-128, zp corrected in the conv epilogue via
precomputed per-channel weight row-sums (ops/conv.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.quant import QTensor, dequantize, quantize
from lowbitdnn_project_tpu.ops import qconv2d, qmax_pool2d
from lowbitdnn_project_tpu.ops.pool import global_avg_pool2d_int32


def test_unsigned_quantize_roundtrip(rng):
    x = np.abs(rng.normal(size=(4, 64)).astype(np.float32)) * 10
    q = quantize(jnp.asarray(x), unsigned=True)
    assert q.zero_point is not None and int(q.zero_point) == -128
    assert q.values.dtype == jnp.int8
    deq = np.asarray(dequantize(q))
    # 256 levels over [0, absmax]: error bounded by scale/2
    assert np.max(np.abs(deq - x)) <= float(q.scale) / 2 + 1e-6
    # zero maps exactly (zp representable)
    z = quantize(jnp.zeros((4,)) + jnp.asarray([0.0, 1.0, 2.0, 4.0]),
                 unsigned=True)
    assert int(z.values[0]) == -128 and float(dequantize(z)[0]) == 0.0


def test_unsigned_doubles_resolution_vs_symmetric(rng):
    """The point of the uint8 path: one-sided data gets ~2x finer steps."""
    x = jnp.asarray(np.abs(rng.normal(size=(1024,))).astype(np.float32))
    qs = quantize(x)
    qu = quantize(x, unsigned=True)
    err_s = float(jnp.max(jnp.abs(dequantize(qs) - x)))
    err_u = float(jnp.max(jnp.abs(dequantize(qu) - x)))
    assert err_u < err_s * 0.75  # ~0.5x in expectation


def test_unsigned_integer_valued_exact(rng):
    # integer-valued inputs in [0, 255] with absmax 255 -> scale exactly 1
    x = rng.integers(0, 256, size=(8, 32)).astype(np.float32)
    x[0, 0] = 255.0
    q = quantize(jnp.asarray(x), unsigned=True)
    np.testing.assert_array_equal(np.asarray(dequantize(q)), x)


def _ref_asym_conv(x_q, w_q, bias, stride, padding, relu):
    """Oracle: int32 conv of (q - zp) against the same float epilogue."""
    xv = x_q.values.astype(jnp.int32) - x_q.zero_point
    acc = jax.lax.conv_general_dilated(
        xv, w_q.values.astype(jnp.int32), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (
        x_q.scale * w_q.scale_vector()).reshape(-1)
    if bias is not None:
        out = out + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out


@pytest.mark.parametrize("padding,stride,relu", [(0, 1, False), (1, 1, True),
                                                 (2, 2, True), (3, 2, False)])
def test_qconv2d_asymmetric_bit_exact(rng, padding, stride, relu):
    """zp-padding + row-sum correction (zp_fold="acc", the int32-domain
    mode) must match the (q - zp) int32 conv bit-exactly (identical integer
    accumulation, identical float epilogue)."""
    x = np.abs(rng.normal(size=(2, 9, 9, 16)).astype(np.float32)) * 4
    w = rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.3
    b = rng.normal(size=(24,)).astype(np.float32)
    x_q = quantize(jnp.asarray(x), unsigned=True)
    w_q = quantize(jnp.asarray(w), axis=3)
    got = qconv2d(x_q, w_q, jnp.asarray(b), stride=stride, padding=padding,
                  relu=relu, zp_fold="acc")
    ref = _ref_asym_conv(x_q, w_q, jnp.asarray(b), stride, padding, relu)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("padding,stride,relu", [(0, 1, False), (1, 1, True),
                                                 (2, 2, True), (3, 2, False)])
def test_qconv2d_asymmetric_bias_fold(rng, padding, stride, relu):
    """zp_fold="bias" (default, fusion-friendly): same integer accumulation,
    zp correction folded into the bias vector. Float-assoc differs from the
    "acc" mode by ulps only; requantized outputs must agree within |d|<=1
    (the repo's standard requant oracle)."""
    x = np.abs(rng.normal(size=(2, 9, 9, 16)).astype(np.float32)) * 4
    w = rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.3
    b = rng.normal(size=(24,)).astype(np.float32)
    x_q = quantize(jnp.asarray(x), unsigned=True)
    w_q = quantize(jnp.asarray(w), axis=3)
    ref = _ref_asym_conv(x_q, w_q, jnp.asarray(b), stride, padding, relu)
    got = qconv2d(x_q, w_q, jnp.asarray(b), stride=stride, padding=padding,
                  relu=relu, zp_fold="bias")
    scale_mag = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5 * scale_mag)
    # requantized chain: |delta| <= 1 vs the exact-int mode
    os = jnp.asarray(scale_mag / 127.0, jnp.float32)
    qa = qconv2d(x_q, w_q, jnp.asarray(b), stride=stride, padding=padding,
                 relu=True, out_scale=os, zp_fold="acc")
    qb = qconv2d(x_q, w_q, jnp.asarray(b), stride=stride, padding=padding,
                 relu=True, out_scale=os, zp_fold="bias")
    d = np.abs(np.asarray(qa.values, np.int32) -
               np.asarray(qb.values, np.int32))
    assert d.max() <= 1, d.max()


def test_qconv2d_asymmetric_groups(rng):
    x = np.abs(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    w = rng.normal(size=(3, 3, 1, 16)).astype(np.float32) * 0.3
    x_q = quantize(jnp.asarray(x), unsigned=True)
    w_q = quantize(jnp.asarray(w), axis=3)
    got = qconv2d(x_q, w_q, None, padding=1, groups=16, zp_fold="acc")
    xv = x_q.values.astype(jnp.int32) - x_q.zero_point
    acc = jax.lax.conv_general_dilated(
        xv, w_q.values.astype(jnp.int32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=16, preferred_element_type=jnp.int32)
    ref = acc.astype(jnp.float32) * (
        x_q.scale * w_q.scale_vector()).reshape(-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_qconv2d_unsigned_output_requant(rng):
    x = np.abs(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    w = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.3
    x_q = quantize(jnp.asarray(x))
    w_q = quantize(jnp.asarray(w), axis=3)
    fl = qconv2d(x_q, w_q, None, padding=1, relu=True)
    out_scale = float(jnp.max(fl)) / 255.0
    oq = qconv2d(x_q, w_q, None, padding=1, relu=True,
                 out_scale=out_scale, out_unsigned=True)
    assert isinstance(oq, QTensor) and oq.zero_point is not None
    err = np.asarray(jnp.abs(dequantize(oq) - fl))
    assert err.max() <= out_scale / 2 + 1e-6
    # chained consumption: asym output feeds the next conv exactly
    w2 = quantize(jnp.asarray(
        rng.normal(size=(1, 1, 8, 8)).astype(np.float32) * 0.2), axis=3)
    nxt = qconv2d(oq, w2, None, zp_fold="acc")
    ref = _ref_asym_conv(oq, w2, None, 1, 0, False)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(ref))


def test_out_unsigned_requires_relu(rng):
    x_q = quantize(jnp.ones((1, 4, 4, 8)))
    w_q = quantize(jnp.ones((1, 1, 8, 8)) * 0.1, axis=3)
    with pytest.raises(ValueError):
        qconv2d(x_q, w_q, out_scale=0.1, out_unsigned=True)  # no relu
    with pytest.raises(ValueError):
        qconv2d(x_q, w_q, relu=True, out_unsigned=True)  # no out_scale


def test_pool_propagates_zero_point(rng):
    x = np.abs(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    q = quantize(jnp.asarray(x), unsigned=True)
    p = qmax_pool2d(q, 3, 2, 1)
    assert p.zero_point is not None
    ref = jax.lax.reduce_window(
        dequantize(q), -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    # max pool with zp=-128 pad == real-0 pad for non-negative data
    np.testing.assert_allclose(np.asarray(dequantize(p)),
                               np.maximum(np.asarray(ref), 0.0), atol=1e-6)
    g = global_avg_pool2d_int32(q)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jnp.mean(dequantize(q), axis=(1, 2))),
        rtol=1e-5, atol=1e-6)


def test_resnet_chain_act_unsigned(rng):
    """Full int8 chain with asymmetric activations: logits track fp32 at
    least as well as the symmetric chain on the same model."""
    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref = resnet.apply_fp32(params, x, cfg)
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    qp = resnet.quantize_params(params, cfg)
    sym = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla")
    asym = resnet.apply_quantized_int8chain(qp, x, scales, cfg, backend="xla",
                                            act_unsigned=True)
    rn = float(jnp.linalg.norm(ref))
    err_sym = float(jnp.linalg.norm(sym - ref)) / rn
    err_asym = float(jnp.linalg.norm(asym - ref)) / rn
    # finer activation grid must not hurt; allow a little slack for luck
    assert err_asym <= err_sym * 1.25 + 1e-4, (err_asym, err_sym)
    assert err_asym < 0.15


def test_checkpoint_roundtrip_zero_point(tmp_path, rng):
    from lowbitdnn_project_tpu.utils.checkpoint import (
        load_quantized, save_quantized)

    x = np.abs(rng.normal(size=(4, 8)).astype(np.float32))
    q = quantize(jnp.asarray(x), unsigned=True)
    p = str(tmp_path / "asym.lbq")
    save_quantized(p, {"act": q, "plain": quantize(jnp.asarray(x))})
    back = load_quantized(p)
    np.testing.assert_array_equal(np.asarray(back["act"].values),
                                  np.asarray(q.values))
    assert int(back["act"].zero_point) == -128
    assert back["plain"].zero_point is None


def test_qlinear_rejects_zero_point():
    """qlinear has no zp row-sum epilogue; asymmetric inputs must fail
    loudly instead of returning silently-wrong x*w (ADVICE r3)."""
    import pytest
    from lowbitdnn_project_tpu.ops import qlinear
    from lowbitdnn_project_tpu.quant import quantize

    x = jax.random.normal(jax.random.key(0), (4, 8))
    w = jax.random.normal(jax.random.key(1), (8, 5))
    x_u = quantize(x, unsigned=True)
    w_q = quantize(w, axis=1)
    with pytest.raises(NotImplementedError):
        qlinear(x_u, w_q)
