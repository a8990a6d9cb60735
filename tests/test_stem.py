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
    assert w2.shape == (2, 2, 8 * 8 * 3, 4 * 4 * 64)
    # each of the 16 output phases must see all 49 taps of each input channel
    per_out = np.asarray(w2, np.int32).sum(axis=(0, 1, 2)).reshape(4, 4, 64)
    assert (per_out == 49 * 3).all()


def test_s2d_fold_shapes():
    x = jnp.zeros((2, 224, 224, 3), jnp.int8)
    assert space_to_depth_input(x).shape == (2, 29, 29, 192)


def test_stem_bitexact_vs_classic():
    x_q, w_q, bias = _mk_inputs()
    out_scale = jnp.float32(0.05)

    ref = qconv2d(x_q, w_q, bias, stride=2, padding=3, relu=True,
                  out_scale=out_scale, backend="xla")
    ref = qmax_pool2d(ref, 3, 2, 1)

    got = stem_conv_pool_s2d(x_q, w_q, bias, out_scale, relu=True,
                             interpret=True)

    assert got.shape == (2, 56, 56, 64)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(ref.values))
    np.testing.assert_allclose(float(got.scale), float(ref.scale))


def _fold_4x4(v):
    """(N,112,112,K) -> (N,28,28,(py,px,K)) 4x4 space-to-depth."""
    n, h, w, k = v.shape
    f = v.reshape(n, h // 4, 4, w // 4, 4, k).transpose(0, 1, 3, 2, 4, 5)
    return f.reshape(n, h // 4, w // 4, 16 * k)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_pool_s2d_matches_reduce_window(use_pallas):
    """Phase-domain pool == reduce_window pool on the unfolded image."""
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.integers(-127, 128, (2, 112, 112, 64)), jnp.int8)
    ref = qmax_pool2d(QTensor(values=v, scale=jnp.float32(1.0)), 3, 2, 1)
    got = pool_s2d_phases(_fold_4x4(v), interpret=True,
                          use_pallas=use_pallas)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.values))


def test_int8chain_stem_routing_bitexact(rng):
    """apply_quantized_int8chain(stem_backend='s2d8') == 'classic' exactly."""
    from lowbitdnn_project_tpu.models import resnet
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=False,
                              num_classes=4, width=64)
    params = resnet.init_params(jax.random.key(2), cfg)
    qparams = resnet.quantize_params(params, cfg)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    ref = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic")
    got = resnet.apply_quantized_int8chain(qparams, x, scales, cfg,
                                           backend="xla", stem_backend="s2d8",
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
