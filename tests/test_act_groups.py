"""Per-channel/group ACTIVATION scales (reference parity: the fused kernel's
per-4-channel-group activation quantization, cpp/int8conv/
conv2DForward3x3Fused.cuh:15-31). TPU re-expression: group-constant
per-channel scales (quant.group_channel_scale) consumed exactly by a
group-split int8 conv/GEMM with the group scales applied in a float
weighted sum of int32 partials (ops/conv.py, ops/linear.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.ops import qconv2d, qlinear
from lowbitdnn_project_tpu.quant import (
    dequantize, group_channel_scale, quantize)


def _ref_grouped_conv(x_q, w_q, bias, stride, padding, relu):
    """Oracle: per-group int32 convs weighted by each group's scale —
    the same algebra, built from the trusted conv2d_int32 with numpy sums
    in float64 for the weighted combine."""
    sx = np.asarray(x_q.scale_vector(), np.float64)
    sw = np.asarray(w_q.scale_vector(), np.float64).reshape(-1)
    c = x_q.shape[3]
    accs = []
    for ch in range(c):
        acc = jax.lax.conv_general_dilated(
            x_q.values[..., ch:ch + 1].astype(jnp.int32),
            w_q.values[:, :, ch:ch + 1, :].astype(jnp.int32),
            (stride, stride), ((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        accs.append(np.asarray(acc, np.float64) * sx[ch])
    out = sum(accs) * sw
    if bias is not None:
        out = out + np.asarray(bias, np.float64)
    if relu:
        out = np.maximum(out, 0.0)
    return out


def test_group_channel_scale_shape_and_constancy(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 64)).astype(np.float32))
    s = group_channel_scale(x, group_size=16, axis=3)
    assert s.shape == (1, 1, 1, 64)
    sv = np.asarray(s).reshape(4, 16)
    # group-constant
    assert np.all(sv == sv[:, :1])
    # each group scale = that group's absmax / 127
    for g in range(4):
        gm = float(jnp.max(jnp.abs(x[..., g * 16:(g + 1) * 16])))
        np.testing.assert_allclose(sv[g, 0], gm / 127.0, rtol=1e-6)


def test_quantize_with_group_scale_roundtrip(rng):
    # per-group scales give each group its own grid: integer multiples of
    # the group scale survive exactly
    x = np.zeros((1, 4, 4, 32), np.float32)
    x[..., :16] = rng.integers(-127, 128, size=(1, 4, 4, 16)) * 0.01
    x[..., 16:] = rng.integers(-127, 128, size=(1, 4, 4, 16)) * 3.0
    xj = jnp.asarray(x)
    # force exact absmax per group by planting the extremes
    x[0, 0, 0, 0], x[0, 0, 0, 16] = 1.27, 381.0
    xj = jnp.asarray(x)
    s = group_channel_scale(xj, group_size=16, axis=3)
    q = quantize(xj, axis=3, scale=s)
    np.testing.assert_allclose(np.asarray(dequantize(q)), x, atol=1e-5)


@pytest.mark.parametrize("padding,stride,relu,gs", [
    (0, 1, False, 8), (1, 1, True, 16), (1, 2, True, 8)])
def test_qconv2d_group_act_scales_exact(rng, padding, stride, relu, gs):
    x = rng.normal(size=(2, 7, 7, 32)).astype(np.float32)
    x[..., 16:] *= 20.0           # wildly different ranges per half
    w = rng.normal(size=(3, 3, 32, 24)).astype(np.float32) * 0.3
    b = rng.normal(size=(24,)).astype(np.float32)
    xj = jnp.asarray(x)
    s = group_channel_scale(xj, group_size=gs, axis=3)
    x_q = quantize(xj, axis=3, scale=s)
    w_q = quantize(jnp.asarray(w), axis=3)
    got = qconv2d(x_q, w_q, jnp.asarray(b), stride=stride, padding=padding,
                  relu=relu, act_group_size=gs)
    ref = _ref_grouped_conv(x_q, w_q, b, stride, padding, relu)
    np.testing.assert_allclose(np.asarray(got, np.float64), ref,
                               rtol=1e-5, atol=1e-4 * np.abs(ref).max())


def test_qconv2d_group_act_beats_per_tensor_on_skewed_ranges(rng):
    """The capability's point: per-group scales keep resolution when one
    channel group dwarfs another's range. The weights read only the
    small-range group, so the per-tensor grid (set by the big group's
    absmax) quantizes away exactly the signal the conv consumes."""
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    x[..., 16:] *= 100.0
    w = rng.normal(size=(3, 3, 32, 16)).astype(np.float32) * 0.2
    w[:, :, 16:, :] = 0.0         # output depends on the small group only
    xj, wj = jnp.asarray(x), jnp.asarray(w)
    fref = jax.lax.conv_general_dilated(
        xj, wj, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w_q = quantize(wj, axis=3)
    out_pt = qconv2d(quantize(xj), w_q, None, padding=1)
    s = group_channel_scale(xj, group_size=16, axis=3)
    out_pg = qconv2d(quantize(xj, axis=3, scale=s), w_q, None, padding=1,
                     act_group_size=16)
    e_pt = float(jnp.linalg.norm(out_pt - fref) / jnp.linalg.norm(fref))
    e_pg = float(jnp.linalg.norm(out_pg - fref) / jnp.linalg.norm(fref))
    assert e_pg < e_pt * 0.5, (e_pg, e_pt)


def test_qconv2d_group_act_requant_and_guards(rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 16)).astype(np.float32))
    w_q = quantize(jnp.asarray(
        rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.3), axis=3)
    s = group_channel_scale(x, group_size=8, axis=3)
    x_q = quantize(x, axis=3, scale=s)
    fl = qconv2d(x_q, w_q, None, padding=1, relu=True, act_group_size=8)
    out_scale = float(jnp.max(fl)) / 127.0
    oq = qconv2d(x_q, w_q, None, padding=1, relu=True,
                 out_scale=jnp.asarray(out_scale, jnp.float32),
                 act_group_size=8)
    d = np.abs(np.asarray(dequantize(oq)) - np.asarray(fl))
    assert d.max() <= out_scale / 2 + 1e-6
    with pytest.raises(ValueError):
        qconv2d(x_q, w_q, None, padding=1, act_group_size=5)  # 5 !| 16
    w_g = quantize(jnp.asarray(
        rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.3), axis=3)
    with pytest.raises(NotImplementedError):
        qconv2d(x_q, w_g, None, padding=1, groups=2, act_group_size=8)


def test_qlinear_group_act_scales_exact(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    x[:, 32:] *= 50.0
    w = rng.normal(size=(64, 10)).astype(np.float32) * 0.2
    b = rng.normal(size=(10,)).astype(np.float32)
    xj = jnp.asarray(x)
    s = group_channel_scale(xj, group_size=32, axis=1)
    x_q = quantize(xj, axis=1, scale=s)
    w_q = quantize(jnp.asarray(w), axis=1)
    got = qlinear(x_q, w_q, jnp.asarray(b), act_group_size=32)
    # float64 oracle from the quantized payloads
    sx = np.asarray(x_q.scale_vector(), np.float64)
    xv = np.asarray(x_q.values, np.float64) * sx
    wv = np.asarray(w_q.values, np.float64) * \
        np.asarray(w_q.scale_vector(), np.float64).reshape(1, -1)
    ref = xv @ wv + b
    np.testing.assert_allclose(np.asarray(got, np.float64), ref,
                               rtol=1e-5, atol=1e-4 * np.abs(ref).max())


def test_resnet_chain_act_groups(rng):
    """Full int8 chain with per-group activation scales: runs end to end,
    tracks fp32 at least as well as the per-tensor chain (finer grids
    can't hurt beyond noise)."""
    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref = resnet.apply_fp32(params, x, cfg)
    qp = resnet.quantize_params(params, cfg)
    s_pt = resnet.calibrate_act_scales(params, [x], cfg)
    s_ch = resnet.calibrate_act_scales(params, [x], cfg, channelwise=True)
    s_g = resnet.group_act_scales(s_ch, group_size=16)
    # grouped scales are group-constant and no looser than per-tensor
    for k, v in s_g.items():
        if jnp.ndim(v) > 0:
            assert float(jnp.max(v)) <= float(s_pt[k]) * (1 + 1e-6)
    base = resnet.apply_quantized_int8chain(qp, x, s_pt, cfg, backend="xla")
    grp = resnet.apply_quantized_int8chain(qp, x, s_g, cfg, backend="xla",
                                           act_groups=16)
    rn = float(jnp.linalg.norm(ref))
    e_base = float(jnp.linalg.norm(base - ref)) / rn
    e_grp = float(jnp.linalg.norm(grp - ref)) / rn
    assert e_grp <= e_base * 1.25 + 1e-4, (e_grp, e_base)
    assert e_grp < 0.15
