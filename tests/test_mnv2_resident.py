"""MobileNet-V2 resident serving chain (kernels/mnv2_resident.py) vs the
classic int8 chain, CPU interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.kernels.mnv2_resident import (
    apply_mnv2_serving_resident, mnv2_block_s1_resident,
    mnv2_block_s2_resident, pack_mnv2_resident,
)
from lowbitdnn_project_tpu.kernels.resident_chain import fold_w
from lowbitdnn_project_tpu.kernels.stage_resident import resident_meta
from lowbitdnn_project_tpu.models import mobilenet
from lowbitdnn_project_tpu.ops.conv import conv2d_int32


def _rand_int8(key, shape, lo=-5, hi=5):
    return jax.random.randint(key, shape, lo, hi + 1, jnp.int8)


def _requant(v, s):
    return jnp.clip(jnp.round(v * (1.0 / s)), -127, 127).astype(jnp.int8)


def _row(v, n):
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1),
                            (n,)).reshape(1, n)


def _dw_oracle(y, wdw, stride):
    """(N,H,W,C) int8 x (3,3,C) per-channel taps -> int32 depthwise."""
    c = y.shape[-1]
    w4 = jnp.zeros((3, 3, c, c), jnp.int8)
    idx = jnp.arange(c)
    w4 = w4.at[:, :, idx, idx].set(wdw)
    return conv2d_int32(y, w4, (stride, stride), (1, 1))


def _assert_delta1(got, ref):
    d = np.abs(np.asarray(got).astype(np.int32) - np.asarray(ref).astype(np.int32))
    assert d.max() <= 1, f"max |delta| {d.max()}, frac>0 {(d > 0).mean():.4f}"


def test_s1_block_matches_oracle():
    h, cin, cmid, cout = 8, 16, 32, 16     # residual (cin == cout)
    keys = jax.random.split(jax.random.key(11), 6)
    x = _rand_int8(keys[0], (1, h, h, cin))
    we = _rand_int8(keys[1], (cin, cmid))
    wdw = _rand_int8(keys[2], (3, 3, cmid))
    wp = _rand_int8(keys[3], (cmid, cout))
    se, sd, sp = 0.011, 0.013, 0.017
    s_dw, s_pj, s_in, s_out = 0.09, 0.12, 0.08, 0.1

    a1 = conv2d_int32(x, we.reshape(1, 1, cin, cmid)).astype(jnp.float32)
    y1 = _requant(jnp.maximum(a1 * se, 0.0), s_dw)
    a2 = _dw_oracle(y1, wdw, 1).astype(jnp.float32)
    y2 = _requant(jnp.maximum(a2 * sd, 0.0), s_pj)
    a3 = conv2d_int32(y2, wp.reshape(1, 1, cmid, cout)).astype(jnp.float32)
    ref = _requant(a3 * sp + x.astype(jnp.float32) * s_in, s_out)

    got = mnv2_block_s1_resident(
        x, we, wdw.reshape(9, 1, cmid), wp,
        _row(se, cmid), _row(0.0, cmid), _row(sd, cmid), _row(0.0, cmid),
        _row(sp, cout), _row(0.0, cout),
        jnp.asarray([s_dw, s_pj, s_in, s_out], jnp.float32),
        meta=resident_meta(1, h, h), has_expand=True, residual=True,
        interpret=True)
    # |delta| <= 1: float epilogues may differ 1 ULP (FMA contraction)
    _assert_delta1(got, ref)


def test_s2_block_matches_oracle():
    h, cin, cmid, cout = 8, 16, 96, 24     # cmid padded to 128 in-kernel
    cmid_p = 128
    keys = jax.random.split(jax.random.key(13), 6)
    x = _rand_int8(keys[0], (1, h, h, cin))
    we = _rand_int8(keys[1], (cin, cmid))
    wdw = _rand_int8(keys[2], (3, 3, cmid))
    wp = _rand_int8(keys[3], (cmid, cout))
    se, sd, sp = 0.011, 0.013, 0.017
    s_dw, s_pj, s_out = 0.09, 0.12, 0.1

    a1 = conv2d_int32(x, we.reshape(1, 1, cin, cmid)).astype(jnp.float32)
    y1 = _requant(jnp.maximum(a1 * se, 0.0), s_dw)
    a2 = _dw_oracle(y1, wdw, 2).astype(jnp.float32)
    y2 = _requant(jnp.maximum(a2 * sd, 0.0), s_pj)
    a3 = conv2d_int32(y2, wp.reshape(1, 1, cmid, cout)).astype(jnp.float32)
    ref = _requant(a3 * sp, s_out)

    def padl(a, n=cmid_p, v=0):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])],
                       constant_values=v)

    z = jnp.zeros_like(we)
    we_bd = jnp.concatenate(
        [jnp.concatenate([padl(we), padl(z)], 1),
         jnp.concatenate([padl(z), padl(we)], 1)], 0)
    lane = lambda v: padl(v.reshape(1, cmid))
    zl = jnp.zeros((1, cmid_p), jnp.int8)
    wa = jnp.stack([jnp.concatenate([lane(wdw[dy, 1]), lane(wdw[dy, 2])], 1)
                    for dy in range(3)])
    wb = jnp.stack([jnp.concatenate([zl, lane(wdw[dy, 0])], 1)
                    for dy in range(3)])
    got = mnv2_block_s2_resident(
        fold_w(x), we_bd, wa, wb,
        jnp.pad(wp, ((0, cmid_p - cmid), (0, 0))),
        jnp.tile(padl(_row(se, cmid), v=1.0), (1, 2)),
        jnp.tile(padl(_row(0.0, cmid)), (1, 2)),
        padl(_row(sd, cmid), v=1.0), padl(_row(0.0, cmid)),
        _row(sp, cout), _row(0.0, cout),
        jnp.asarray([s_dw, s_pj, 0.0, s_out], jnp.float32),
        meta=resident_meta(1, h, h // 2),
        out_meta=resident_meta(1, h // 2, h // 2), interpret=True)
    _assert_delta1(got, ref)


def test_apply_mnv2_resident_matches_chain(rng):
    """Full stem->head resident forward vs the classic int8 chain on a
    64x64 MobileNet-V2 (same stage plan, smaller spatial)."""
    cfg = mobilenet.MOBILENET_V2
    params = mobilenet.init_params(jax.random.key(0), cfg)
    qp = mobilenet.quantize_params(params, cfg)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], cfg)
    pack = pack_mnv2_resident(qp, scales, cfg)
    got = apply_mnv2_serving_resident(qp, x, scales, cfg, pack,
                                      interpret=True)
    # vs the f32-epilogue classic chain: the kernels compute the same f32
    # math (measured exact on this geometry; gate leaves 1-ULP headroom)
    ref32 = mobilenet.apply_quantized_int8chain(
        qp, x, scales, cfg, backend="xla", stem_domain="int8",
        dw_domain="int8", add_domain="float", act_dtype=jnp.float32)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref32, -1)).all()
    rel = float(jnp.linalg.norm(got - ref32) / jnp.linalg.norm(ref32))
    assert rel < 0.02, rel
    # vs the shipped bf16-epilogue chain: argmax-level agreement (bf16
    # epilogues drift per block; the resident chain is the MORE exact one)
    ref16 = mobilenet.apply_quantized_int8chain(
        qp, x, scales, cfg, backend="xla", stem_domain="int8",
        dw_domain="int8", add_domain="float")
    assert (jnp.argmax(got, -1) == jnp.argmax(ref16, -1)).all()
