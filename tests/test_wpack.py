"""Output-pair-packed 3x3 conv (ops/wpack.py): bit-exactness vs the XLA
backend, epilogue parity, chain-routing equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from lowbitdnn_project_tpu.quant import quantize, QTensor
from lowbitdnn_project_tpu.ops import qconv2d
from lowbitdnn_project_tpu.ops.wpack import pack_wpair_weights, qconv3x3_wpack


def _mk(b=2, h=10, w=12, c=5, k=7, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    wt = (rng.normal(size=(3, 3, c, k)) * 0.2).astype(np.float32)
    return quantize(jnp.asarray(x)), quantize(jnp.asarray(wt), axis=3), rng


def test_pack_weights_block_structure():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.integers(-8, 8, (3, 3, 4, 6)), jnp.int8)
    wp = np.asarray(pack_wpair_weights(w))
    assert wp.shape == (3, 2, 8, 12)
    # dead blocks: (q=0, p=0 -> j=1) and (q=1, p=1 -> j=0)
    assert not wp[:, 0, 0:4, 6:12].any()
    assert not wp[:, 1, 4:8, 0:6].any()
    # live block spot-check: q=1, p=0 -> j=0 carries dx=2
    np.testing.assert_array_equal(wp[:, 1, 0:4, 0:6], np.asarray(w[:, 2]))


def test_bit_exact_float_out():
    x_q, w_q, _ = _mk()
    ref = qconv2d(x_q, w_q, stride=1, padding=1, backend="xla")
    got = qconv3x3_wpack(x_q, w_q)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_bit_exact_requant_bias_relu():
    x_q, w_q, rng = _mk(b=1, h=8, w=8, c=64, k=64, seed=2)
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = qconv2d(x_q, w_q, bias, stride=1, padding=1, relu=True,
                  out_scale=0.07, backend="xla")
    got = qconv3x3_wpack(x_q, w_q, bias, relu=True, out_scale=0.07)
    assert got.values.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(ref.values),
                                  np.asarray(got.values))
    assert float(ref.scale) == float(got.scale)


def test_prepacked_weights_path():
    x_q, w_q, _ = _mk(seed=3)
    wp = pack_wpair_weights(w_q.values)
    ref = qconv3x3_wpack(x_q, w_q)
    got = qconv3x3_wpack(x_q, w_q, wpack=wp)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_qconv2d_backend_wpack():
    x_q, w_q, _ = _mk(seed=4)
    ref = qconv2d(x_q, w_q, stride=1, padding=1, backend="xla")
    got = qconv2d(x_q, w_q, stride=1, padding=1, backend="wpack")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    with pytest.raises(NotImplementedError):
        qconv2d(x_q, w_q, stride=2, padding=1, backend="wpack")


def test_odd_width_rejected():
    x_q, w_q, _ = _mk(w=11, seed=5)
    with pytest.raises(ValueError, match="even W"):
        qconv3x3_wpack(x_q, w_q)


def test_triple_identity_tail_matches_classic_int8_domain():
    """qbottleneck_wpack's fused residual tail must reproduce the chain's
    add_domain="int8" tail exactly: c3 requant at s_out, identity rescale,
    int16 add, clip(0,127)."""
    import jax
    from lowbitdnn_project_tpu.models.layers import QConvParams
    from lowbitdnn_project_tpu.ops.wpack import qbottleneck_wpack

    rng = np.random.default_rng(7)
    a, c, b = 24, 8, 24
    x_q = quantize(jnp.asarray(rng.normal(size=(2, 6, 10, a)), jnp.float32))
    mk = lambda kh, kw, ci, co: QConvParams(
        weight=quantize(jnp.asarray(
            rng.normal(size=(kh, kw, ci, co)) * 0.2, jnp.float32), axis=3),
        bias=jnp.asarray(rng.normal(size=(co,)), jnp.float32))
    p1, p2, p3 = mk(1, 1, a, c), mk(3, 3, c, c), mk(1, 1, c, b)
    s2, s3, s_out = 0.05, 0.06, 0.07

    got = qbottleneck_wpack(x_q, p1, p2, p3, s2, s3,
                            out_scale=s_out, identity=x_q)
    # classic int8-domain tail
    h = qconv2d(x_q, p1.weight, p1.bias, relu=True, out_scale=s2)
    h = qconv2d(h, p2.weight, p2.bias, padding=1, relu=True, out_scale=s3)
    h = qconv2d(h, p3.weight, p3.bias, relu=False, out_scale=s_out)
    r = jnp.round(x_q.values.astype(jnp.float32) * (x_q.scale / s_out))
    id_rs = jnp.clip(r, -127, 127).astype(jnp.int8)
    ref = jnp.clip(h.values.astype(jnp.int16) + id_rs.astype(jnp.int16),
                   0, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got.values))


def test_resnet_chain_wpack_close():
    """layer1 wpack routing deviates from the float-add classic chain only
    by one int8 rounding of the residual branch — logits must stay close,
    and under add_domain="int8" must match exactly."""
    import jax
    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=8, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    qparams = resnet.quantize_params(params, cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    y0 = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                          use_wpack=False)
    y1 = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                          use_wpack=True)
    rel = float(jnp.linalg.norm((y1 - y0).astype(jnp.float32))
                / (jnp.linalg.norm(y0.astype(jnp.float32)) + 1e-9))
    assert rel < 0.05, rel
    z0 = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                          add_domain="int8", use_wpack=False)
    z1 = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                          add_domain="int8", use_wpack=True)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
