"""Contiguous resident serving chain (kernels/resident_chain.py):
folded-W glue algebra + block kernels + the full stem->head forward,
all vs the per-conv chain oracle on CPU interpret mode."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.resident_chain import (
    apply_serving_resident, block_ds_resident, fold_block_weights, fold_w,
    pack_resident_chain,
)
from lowbitdnn_project_tpu.kernels.stage_resident import resident_meta
from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.ops.conv import conv2d_int32


def _rand_int8(key, shape, lo=-5, hi=5):
    return jax.random.randint(key, shape, lo, hi + 1, jnp.int8)


def test_fold_w_roundtrip(rng):
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 32)).astype(np.int8))
    f = fold_w(x)
    assert f.shape == (2, 8, 4, 64)
    # lane halves are the W-parities
    np.testing.assert_array_equal(np.asarray(f[..., :32]),
                                  np.asarray(x[:, :, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(f[..., 32:]),
                                  np.asarray(x[:, :, 1::2, :]))


def test_folded_weights_preserve_conv(rng):
    """A stride-1 3x3 in folded coordinates with fold_block_weights' w2
    equals the unfolded conv (the algebra the layer1 kernels rely on)."""
    k1, k2 = jax.random.split(jax.random.key(7))
    c = 16
    x = _rand_int8(k1, (1, 6, 6, c))
    w2 = _rand_int8(k2, (3, 3, c, c))
    f = fold_block_weights(jnp.eye(c, dtype=jnp.int8), w2,
                           jnp.eye(c, dtype=jnp.int8))
    w2f = f["w2"].reshape(3, 3, 2 * c, 2 * c)   # (dy, q) taps
    xf = fold_w(x)                              # (1, 6, 3, 2c)
    ref = conv2d_int32(x, w2, (1, 1), (1, 1))
    got = conv2d_int32(xf, jnp.transpose(w2f, (0, 1, 2, 3)).reshape(
        3, 3, 2 * c, 2 * c), (1, 1), (1, 1))
    # folded output lanes [:c] are even W positions, [c:] odd
    np.testing.assert_array_equal(np.asarray(got[..., :c]),
                                  np.asarray(ref[:, :, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(got[..., c:]),
                                  np.asarray(ref[:, :, 1::2, :]))


def test_ds_block_matches_chain(rng):
    """Stride-2 downsample block kernel vs the op-by-op oracle."""
    h, cin, cmid, cout = 8, 128, 128, 256
    keys = jax.random.split(jax.random.key(3), 8)
    x = _rand_int8(keys[0], (1, h, h, cin))
    w1 = _rand_int8(keys[1], (1, 1, cin, cmid))
    w2 = _rand_int8(keys[2], (3, 3, cmid, cmid))
    w3 = _rand_int8(keys[3], (1, 1, cmid, cout))
    wp = _rand_int8(keys[4], (1, 1, cin, cout))
    s1 = jnp.full((cmid,), 0.013037, jnp.float32)
    s3 = jnp.full((cout,), 0.011071, jnp.float32)
    sy1, sy2, so = 0.090137, 0.120219, 0.070111

    def requant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127, 127).astype(jnp.int8)

    a1 = conv2d_int32(x, w1).astype(jnp.float32)
    y1 = requant(jnp.maximum(a1 * s1, 0.0), sy1)
    a2 = conv2d_int32(y1, w2, (2, 2), (1, 1)).astype(jnp.float32)
    y2 = requant(jnp.maximum(a2 * s1, 0.0), sy2)
    a3 = conv2d_int32(y2, w3).astype(jnp.float32)
    pj = conv2d_int32(x, wp, (2, 2)).astype(jnp.float32)
    ref = requant(jnp.maximum(a3 * s3 + pj * s3, 0.0), so)

    w2v = w2
    w2a = jnp.concatenate([jnp.concatenate([w2v[dy, 1], w2v[dy, 2]])
                           for dy in range(3)])
    w2b = jnp.concatenate([w2v[dy, 0] for dy in range(3)])
    mf = resident_meta(1, h, h // 2)
    mo = resident_meta(1, h // 2, h // 2)
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    got = block_ds_resident(
        fold_w(x), w1[0, 0], w2a, w2b, w3[0, 0], wp[0, 0],
        row(s1), row(jnp.zeros(cmid)), row(s1), row(jnp.zeros(cmid)),
        row(s3), row(jnp.zeros(cout)), row(s3), row(jnp.zeros(cout)),
        jnp.asarray([sy1, sy2, so], jnp.float32),
        meta=mf, out_meta=mo, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_apply_serving_resident_matches_chain(rng):
    """Full stem->head resident forward vs the classic int8 chain on the
    real ResNet-50 geometry (needs the committed calibration scales)."""
    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(0), cfg)
    qp8 = resnet.quantize_params(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    pack = pack_resident_chain(qp8, scales, cfg)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    ref = resnet.apply_quantized_int8chain(qp8, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic")
    got = apply_serving_resident(qp8, x, scales, cfg, pack, interpret=True)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, rel


def test_fold_layer1_bit_identical(rng):
    """fold_layer1 routing (XLA-level folded-W layer1) is bit-identical to
    the classic chain — same sums, rearranged lanes. (e2e it LOSES at
    b32/b128 — fold_l1_ab_r3.json — and stays opt-in; the algebra is
    load-bearing for the resident chain's b1 win.)"""
    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(1), cfg)
    qp8 = resnet.quantize_params(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    qpf = resnet.fold_layer1_params(qp8, cfg)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    ref = resnet.apply_quantized_int8chain(qp8, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic")
    got = resnet.apply_quantized_int8chain(qpf, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic",
                                           fold_layer1=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_apply_partial_resident_matches_chain(rng):
    """Partial residency (classic stem+layer1, resident layer2->layer4):
    the b4/b8 lane's numerics vs the classic chain at b1 geometry."""
    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(2), cfg)
    qp8 = resnet.quantize_params(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        apply_serving_partial_resident)
    pack = pack_resident_chain(qp8, scales, cfg)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    ref = resnet.apply_quantized_int8chain(qp8, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic")
    for start in (1, 2):
        got = apply_serving_partial_resident(
            qp8, x, scales, cfg, pack, start_stage=start, interpret=True)
        assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all(), start
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.1, (start, rel)


def test_apply_resident_with_streamed_ds(rng):
    """mark_stream routing: the full resident forward with DMA-streamed
    downsample blocks matches the plain resident forward bit-exactly."""
    from lowbitdnn_project_tpu.kernels.resident_chain import mark_stream

    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(3), cfg)
    qp8 = resnet.quantize_params(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    pack = pack_resident_chain(qp8, scales, cfg)
    ref = apply_serving_resident(qp8, x, scales, cfg, pack, interpret=True)
    got = apply_serving_resident(qp8, x, scales, cfg, mark_stream(pack),
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ds_block_multi_chunk(rng, monkeypatch):
    """Row-chunked ds kernel (CHUNK < bm, the b4/b8 VMEM regime) is
    bit-identical to the single-chunk trace."""
    import lowbitdnn_project_tpu.kernels.resident_chain as rc

    h, cin, cmid, cout = 8, 128, 128, 256
    keys = jax.random.split(jax.random.key(17), 6)
    x = _rand_int8(keys[0], (1, h, h, cin))
    w1 = _rand_int8(keys[1], (cin, cmid))
    w2 = _rand_int8(keys[2], (3, 3, cmid, cmid))
    w3 = _rand_int8(keys[3], (cmid, cout))
    wp = _rand_int8(keys[4], (cin, cout))
    w2a = jnp.concatenate([jnp.concatenate([w2[dy, 1], w2[dy, 2]])
                           for dy in range(3)])
    w2b = jnp.concatenate([w2[dy, 0] for dy in range(3)])
    mf = resident_meta(1, h, h // 2)
    mo = resident_meta(1, h // 2, h // 2)
    row = lambda v, nn: jnp.full((1, nn), v, jnp.float32)
    args = (row(0.01, cmid), row(0.0, cmid), row(0.01, cmid),
            row(0.0, cmid), row(0.02, cout), row(0.0, cout),
            row(0.02, cout), row(0.0, cout),
            jnp.asarray([0.09, 0.12, 0.07], jnp.float32))
    ref = block_ds_resident(fold_w(x), w1, w2a, w2b, w3, wp, *args,
                            meta=mf, out_meta=mo, interpret=True)
    monkeypatch.setattr(rc, "CHUNK", 16)   # mf.u ~ 60 rows -> 4+ chunks
    jax.clear_caches()                     # drop the single-chunk trace
    got = block_ds_resident(fold_w(x), w1, w2a, w2b, w3, wp, *args,
                            meta=mf, out_meta=mo, interpret=True)
    jax.clear_caches()                     # don't leak the tiny-chunk trace
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_apply_resident_with_streamed_stages(rng):
    """mark_stage_stream routing: the full resident forward with use-order
    DMA-streamed stage kernels matches the plain resident forward
    bit-exactly (same arithmetic, same order — only weight arrival
    overlaps differently)."""
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        mark_stage_stream, mark_stream)

    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(5), cfg)
    qp8 = resnet.quantize_params(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    pack = pack_resident_chain(qp8, scales, cfg)
    ref = apply_serving_resident(qp8, x, scales, cfg, pack, interpret=True)
    streamed = mark_stage_stream(mark_stream(pack))
    assert any(sp.get("stream") for sp in streamed["stages"].values())
    got = apply_serving_resident(qp8, x, scales, cfg, streamed,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
