"""Fused flat-layout bottleneck block vs the op-by-op int8 chain oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.block_flat import bottleneck_flat_int8
from lowbitdnn_project_tpu.kernels.conv_flat import (
    flat_meta, from_flat, to_flat,
)
from lowbitdnn_project_tpu.ops.conv import conv2d_int32


def _rand_int8(key, shape, lo=-5, hi=5):
    return jax.random.randint(key, shape, lo, hi + 1, jnp.int8)


@pytest.mark.parametrize("n,h,w,c,cmid,bm", [
    (2, 8, 8, 256, 128, 256),
    (1, 14, 14, 256, 128, 512),
    (2, 7, 7, 512, 128, 256),
])
def test_bottleneck_flat_matches_chain(n, h, w, c, cmid, bm):
    keys = jax.random.split(jax.random.key(3), 9)
    x = _rand_int8(keys[0], (n, h, w, c))
    w1 = _rand_int8(keys[1], (1, 1, c, cmid))
    w2 = _rand_int8(keys[2], (3, 3, cmid, cmid))
    w3 = _rand_int8(keys[3], (1, 1, cmid, c))
    b1 = jax.random.normal(keys[4], (cmid,), jnp.float32)
    b2 = jax.random.normal(keys[5], (cmid,), jnp.float32)
    b3 = jax.random.normal(keys[6], (c,), jnp.float32)
    s1 = jnp.full((cmid,), 0.013, jnp.float32)
    s2 = jnp.full((cmid,), 0.017, jnp.float32)
    s3 = jnp.full((c,), 0.011, jnp.float32)
    sc_y1, sc_y2, sc_x, sc_out = 0.09, 0.12, 0.05, 0.15

    m = flat_meta(n, h, w)
    out_f = bottleneck_flat_int8(
        to_flat(x, m), w1[0, 0], w2, w3[0, 0],
        jnp.asarray([sc_y1, sc_y2, sc_x, sc_out], jnp.float32),
        s1, b1, s2, b2, s3, b3, meta=m, bm=bm, interpret=True)
    got = np.asarray(from_flat(out_f, m))

    # oracle: the same int8 chain through conv2d_int32, f32 epilogues
    def requant(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    a1 = conv2d_int32(x, w1).astype(jnp.float32)
    y1 = requant(jnp.maximum(a1 * s1 + b1, 0.0), sc_y1)
    a2 = conv2d_int32(y1, w2, (1, 1), (1, 1)).astype(jnp.float32)
    y2 = requant(jnp.maximum(a2 * s2 + b2, 0.0), sc_y2)
    a3 = conv2d_int32(y2, w3).astype(jnp.float32)
    h3 = a3 * s3 + b3 + x.astype(jnp.float32) * sc_x
    ref = np.asarray(requant(jnp.maximum(h3, 0.0), sc_out))

    np.testing.assert_array_equal(got, ref)
