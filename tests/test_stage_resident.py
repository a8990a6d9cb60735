"""VMEM-resident stage kernel (batch-1 serving formulation) vs the
op-by-op int8 chain oracle, plus its chain routing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.stage_resident import (
    from_resident, pack_stage_resident, resident_meta, stage_resident_int8,
    to_resident,
)
from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.ops.conv import conv2d_int32


def _rand_int8(key, shape, lo=-5, hi=5):
    return jax.random.randint(key, shape, lo, hi + 1, jnp.int8)


def _requant(v, s):
    # multiply-by-reciprocal to match the kernel's epilogue bit-for-bit —
    # v/s differs by 1 ulp on .5 ties, and a 1-LSB tie flip in block b
    # amplifies through block b+1's convs (only visible at nblk >= 2)
    return jnp.clip(jnp.round(v * (1.0 / s)), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize("n,h,w,c,cmid,nblk", [
    (1, 14, 14, 256, 128, 2),
    (1, 7, 7, 512, 128, 3),
    (2, 8, 8, 256, 128, 1),
])
def test_stage_resident_matches_chain(n, h, w, c, cmid, nblk):
    keys = jax.random.split(jax.random.key(5), 1 + 7 * nblk)
    x = _rand_int8(keys[0], (n, h, w, c))

    blocks, chains = [], []
    sc = 0.050173                                # input scale of block 0
    for b in range(nblk):
        kk = keys[1 + 7 * b:8 + 7 * b]
        blk = dict(
            w1=_rand_int8(kk[0], (1, 1, c, cmid)),
            w2=_rand_int8(kk[1], (3, 3, cmid, cmid)),
            w3=_rand_int8(kk[2], (1, 1, cmid, c)),
            b1=jax.random.normal(kk[3], (cmid,), jnp.float32),
            b2=jax.random.normal(kk[4], (cmid,), jnp.float32),
            b3=jax.random.normal(kk[5], (c,), jnp.float32),
            # tie-free scale constants: round scales like 0.013 land some
            # requant operands exactly on .5, and XLA's per-program FMA
            # contraction (CLAUDE.md) flips those ties between the kernel
            # and the oracle graph — a 1-LSB y1 flip then amplifies through
            # conv2/conv3 into |delta| up to 8 at the block output
            s1=jnp.full((cmid,), 0.013037, jnp.float32),
            s2=jnp.full((cmid,), 0.017113, jnp.float32),
            s3=jnp.full((c,), 0.011071, jnp.float32),
        )
        sc_out = 0.050173 + 0.030111 * (b + 1)
        chains.append([0.090137 + 0.0107 * b, 0.120219 + 0.0107 * b,
                       sc, sc_out])
        blocks.append(blk)
        sc = sc_out

    m = resident_meta(n, h, w)
    out_f = stage_resident_int8(
        to_resident(x, m),
        jnp.concatenate([b["w1"][0, 0] for b in blocks]),
        jnp.concatenate([b["w2"].reshape(9 * cmid, cmid) for b in blocks]),
        jnp.concatenate([b["w3"][0, 0] for b in blocks]),
        jnp.stack([b["s1"] for b in blocks]),
        jnp.stack([b["b1"] for b in blocks]),
        jnp.stack([b["s2"] for b in blocks]),
        jnp.stack([b["b2"] for b in blocks]),
        jnp.stack([b["s3"] for b in blocks]),
        jnp.stack([b["b3"] for b in blocks]),
        jnp.asarray(chains, jnp.float32),
        meta=m, nblk=nblk, interpret=True)
    got = np.asarray(from_resident(out_f, m))

    # oracle: the same int8 chain through conv2d_int32, f32 epilogues
    ref = x
    for b, blk in enumerate(blocks):
        sc_y1, sc_y2, sc_x, sc_out = chains[b]
        a1 = conv2d_int32(ref, blk["w1"]).astype(jnp.float32)
        y1 = _requant(jnp.maximum(a1 * blk["s1"] + blk["b1"], 0.0), sc_y1)
        a2 = conv2d_int32(y1, blk["w2"], (1, 1), (1, 1)).astype(jnp.float32)
        y2 = _requant(jnp.maximum(a2 * blk["s2"] + blk["b2"], 0.0), sc_y2)
        a3 = conv2d_int32(y2, blk["w3"]).astype(jnp.float32)
        h3 = a3 * blk["s3"] + blk["b3"] + ref.astype(jnp.float32) * sc_x
        ref = _requant(jnp.maximum(h3, 0.0), sc_out)

    np.testing.assert_array_equal(got, np.asarray(ref))


def test_int8chain_resident_backend(rng):
    """block_backend='resident' + pack_stage_resident matches the per-conv
    chain. Width 32 makes stages 3/4 eligible (C=512/1024, Cmid=128/256);
    stage 3 has a 2-block identity run."""
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 3, 2), bottleneck=True,
                              num_classes=10, width=32)
    params = resnet.init_params(jax.random.key(2), cfg)
    qparams = resnet.quantize_params(params, cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    packs = pack_stage_resident(qparams, scales, cfg)
    assert 2 in packs and 3 in packs, packs.keys()
    assert packs[2]["nblk"] == 2 and packs[3]["nblk"] == 1

    ref = resnet.apply_quantized_int8chain(
        qparams, x, scales, cfg, backend="xla", act_dtype=jnp.float32)
    got = resnet.apply_quantized_int8chain(
        qparams, x, scales, cfg, backend="xla", act_dtype=jnp.float32,
        block_backend="resident", stage_packs=packs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()


def test_resident_layout_roundtrip(rng):
    x = jnp.asarray(rng.integers(-127, 128, size=(2, 14, 14, 128))
                    .astype(np.int8))
    m = resident_meta(2, 14, 14)
    np.testing.assert_array_equal(
        np.asarray(from_resident(to_resident(x, m), m)), np.asarray(x))
