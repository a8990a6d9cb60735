"""W4A8 resident chain (kernels/resident_w4a8.py): nibble-packed weight
streaming must be BIT-IDENTICAL to the int8 resident kernels fed the same
int4 values, and the full mixed-precision forward must track the classic
chain."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.kernels.matmul_w4a8 import pack_int4_rows
from lowbitdnn_project_tpu.kernels.resident_chain import (
    block_ds_resident, fold_w, stage_nhwc_resident,
)
from lowbitdnn_project_tpu.kernels.resident_w4a8 import (
    apply_serving_resident_w4, block_ds_resident_w4, mixed_w4_qparams,
    pack_resident_chain_w4, stage_nhwc_resident_w4,
)
from lowbitdnn_project_tpu.kernels.stage_resident import resident_meta
from lowbitdnn_project_tpu.models import resnet


def _rand_int4(key, shape):
    return jax.random.randint(key, shape, -8, 8, jnp.int8)


def test_stage_w4_bit_identical_to_int8_twin(rng):
    """Same int4 values through the packed and unpacked stage kernels."""
    n, h, w, c, cmid, nblk = 1, 8, 8, 256, 128, 2
    keys = jax.random.split(jax.random.key(5), 6)
    x = jax.random.randint(keys[0], (n, h, w, c), -127, 128, jnp.int8)
    w1 = _rand_int4(keys[1], (nblk * c, cmid))
    w2 = _rand_int4(keys[2], (nblk * 9 * cmid, cmid))
    w3 = _rand_int4(keys[3], (nblk * cmid, c))
    s1 = jnp.full((nblk, cmid), 0.01, jnp.float32)
    b1 = jnp.zeros((nblk, cmid), jnp.float32)
    s3 = jnp.full((nblk, c), 0.02, jnp.float32)
    b3 = jnp.zeros((nblk, c), jnp.float32)
    chain = jnp.tile(jnp.asarray([0.1, 0.12, 0.07, 0.09], jnp.float32),
                     (nblk, 1))
    meta = resident_meta(n, h, w)
    ref = stage_nhwc_resident(x, w1, w2, w3, s1, b1, s1, b1, s3, b3, chain,
                              meta=meta, nblk=nblk, interpret=True)
    got = stage_nhwc_resident_w4(
        x,
        pack_int4_rows(w1, block_k=c),
        pack_int4_rows(w2, block_k=cmid),
        pack_int4_rows(w3, block_k=cmid),
        s1, b1, s1, b1, s3, b3, chain, meta=meta, nblk=nblk, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ds_w4_bit_identical_to_int8_twin(rng):
    h, cin, cmid, cout = 8, 128, 128, 256
    keys = jax.random.split(jax.random.key(9), 8)
    x = jax.random.randint(keys[0], (1, h, h, cin), -127, 128, jnp.int8)
    w1 = _rand_int4(keys[1], (cin, cmid))
    w2a = _rand_int4(keys[2], (3 * 2 * cmid, cmid))
    w2b = _rand_int4(keys[3], (3 * cmid, cmid))
    w3 = _rand_int4(keys[4], (cmid, cout))
    wp = _rand_int4(keys[5], (cin, cout))
    row = lambda v, nn: jnp.full((1, nn), v, jnp.float32)
    zr = lambda nn: jnp.zeros((1, nn), jnp.float32)
    args = (row(0.01, cmid), zr(cmid), row(0.01, cmid), zr(cmid),
            row(0.02, cout), zr(cout), row(0.02, cout), zr(cout),
            jnp.asarray([0.09, 0.12, 0.07], jnp.float32))
    mf = resident_meta(1, h, h // 2)
    mo = resident_meta(1, h // 2, h // 2)
    xf = fold_w(x)
    ref = block_ds_resident(xf, w1, w2a, w2b, w3, wp, *args,
                            meta=mf, out_meta=mo, interpret=True)
    got = block_ds_resident_w4(
        xf,
        pack_int4_rows(w1, block_k=cin),
        pack_int4_rows(w2a, block_k=2 * cmid),
        pack_int4_rows(w2b, block_k=cmid),
        pack_int4_rows(w3, block_k=cmid),
        pack_int4_rows(wp, block_k=cin),
        *args, meta=mf, out_meta=mo, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_apply_serving_resident_w4_matches_chain(rng):
    """Mixed-precision (int4 layers 3-4) resident forward vs the classic
    chain running the SAME mixed qparams."""
    cfg = resnet.RESNET50
    params = resnet.init_params(jax.random.key(0), cfg)
    qp = mixed_w4_qparams(params, cfg)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache.json")
    with open(path) as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    pack = pack_resident_chain_w4(qp, scales, cfg)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    ref = resnet.apply_quantized_int8chain(qp, x, scales, cfg,
                                           backend="xla",
                                           stem_backend="classic")
    got = apply_serving_resident_w4(qp, x, scales, cfg, pack,
                                    interpret=True)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, rel


def test_ds_stream_bit_identical(rng):
    """The DMA-streamed ds kernel (both packed and unpacked) matches the
    plain resident ds kernel bit-exactly."""
    from lowbitdnn_project_tpu.kernels.resident_stream import (
        block_ds_resident_stream)

    h, cin, cmid, cout = 8, 128, 128, 256
    keys = jax.random.split(jax.random.key(21), 8)
    x = jax.random.randint(keys[0], (1, h, h, cin), -127, 128, jnp.int8)
    w1 = _rand_int4(keys[1], (cin, cmid))
    w2a = _rand_int4(keys[2], (3 * 2 * cmid, cmid))
    w2b = _rand_int4(keys[3], (3 * cmid, cmid))
    w3 = _rand_int4(keys[4], (cmid, cout))
    wp = _rand_int4(keys[5], (cin, cout))
    row = lambda v, nn: jnp.full((1, nn), v, jnp.float32)
    zr = lambda nn: jnp.zeros((1, nn), jnp.float32)
    args = (row(0.01, cmid), zr(cmid), row(0.01, cmid), zr(cmid),
            row(0.02, cout), zr(cout), row(0.02, cout), zr(cout),
            jnp.asarray([0.09, 0.12, 0.07], jnp.float32))
    mf = resident_meta(1, h, h // 2)
    mo = resident_meta(1, h // 2, h // 2)
    xf = fold_w(x)
    ref = block_ds_resident(xf, w1, w2a, w2b, w3, wp, *args,
                            meta=mf, out_meta=mo, interpret=True)
    got_u = block_ds_resident_stream(
        xf, w1, w2a, w2b, w3, wp, *args, meta=mf, out_meta=mo,
        packed=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(ref))
    got_p = block_ds_resident_stream(
        xf,
        pack_int4_rows(w1, block_k=cin),
        pack_int4_rows(w2a, block_k=2 * cmid),
        pack_int4_rows(w2b, block_k=cmid),
        pack_int4_rows(w3, block_k=cmid),
        pack_int4_rows(wp, block_k=cin),
        *args, meta=mf, out_meta=mo, packed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref))
