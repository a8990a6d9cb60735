"""Flat pitched-layout direct conv (kernel-lab v3) correctness tests.

Oracle pyramid per SURVEY §4: integer-valued inputs, bit-exact int32 match
against conv2d_int32 (the XLA oracle), plus round-trip and chain-invariant
checks of the layout itself.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.conv_flat import (
    FlatMeta, conv_flat_int8, flat_meta, from_flat, live_mask, to_flat,
)
from lowbitdnn_project_tpu.ops.conv import conv2d_int32


def _rand_int8(key, shape, lo=-5, hi=5):
    return jax.random.randint(key, shape, lo, hi + 1, jnp.int8)


def test_flat_roundtrip():
    key = jax.random.key(0)
    x = _rand_int8(key, (3, 6, 5, 128))
    m = flat_meta(3, 6, 5)
    xf = to_flat(x, m)
    assert xf.shape == (m.u, 128)
    np.testing.assert_array_equal(np.asarray(from_flat(xf, m)), np.asarray(x))


def test_live_mask_matches_layout():
    m = flat_meta(2, 4, 3)
    x = jnp.ones((2, 4, 3, 128), jnp.int8)
    xf = to_flat(x, m)
    mask = live_mask(m)
    # mask==1 exactly where the flat array is live (ones); pad rows are zero
    interior = np.asarray(xf)[1024:1024 + m.l_pad, 0]
    np.testing.assert_array_equal(interior != 0, mask[:, 0] != 0)


@pytest.mark.parametrize("n,h,w,c,k,ksz", [
    (2, 8, 8, 128, 128, 3),
    (1, 14, 14, 256, 128, 3),
    (2, 7, 5, 128, 256, 3),   # odd spatial, K > bk path
    (2, 8, 8, 128, 128, 1),   # 1x1 conv in flat layout
    (1, 9, 9, 128, 128, 5),   # 5x5 taps
])
def test_conv_flat_bit_exact(n, h, w, c, k, ksz):
    keys = jax.random.split(jax.random.key(1), 2)
    x = _rand_int8(keys[0], (n, h, w, c))
    wt = _rand_int8(keys[1], (ksz, ksz, c, k))
    m = flat_meta(n, h, w, pad=max(1, ksz // 2))
    xf = to_flat(x, m)

    out_f = conv_flat_int8(
        xf, wt, jnp.ones((k,), jnp.float32), meta=m, kh=ksz, kw=ksz,
        bm=256, bk=128, interpret=True)
    got = from_flat(out_f, m)

    ref = conv2d_int32(x, wt, (1, 1), (ksz // 2, ksz // 2)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv_flat_epilogue_and_chain():
    """relu+bias+requant epilogue, then a second conv consuming the output
    directly in flat layout — the layout invariant must hold bit-exactly."""
    n, h, w, c, k = 2, 8, 6, 128, 128
    keys = jax.random.split(jax.random.key(2), 4)
    x = _rand_int8(keys[0], (n, h, w, c))
    w1 = _rand_int8(keys[1], (3, 3, c, k))
    w2 = _rand_int8(keys[2], (3, 3, k, k))
    bias = jax.random.normal(keys[3], (k,), jnp.float32)
    m = flat_meta(n, h, w)
    s1 = jnp.full((k,), 0.07, jnp.float32)
    os1 = jnp.asarray(0.11, jnp.float32)

    y1_f = conv_flat_int8(to_flat(x, m), w1, s1, bias, os1, meta=m,
                          relu=True, requant=True, bm=256, interpret=True)
    y2_f = conv_flat_int8(y1_f, w2, jnp.ones((k,), jnp.float32), meta=m,
                          bm=256, interpret=True)
    got = from_flat(y2_f, m)

    # oracle: same epilogue through the XLA path
    acc1 = conv2d_int32(x, w1, (1, 1), (1, 1)).astype(jnp.float32)
    y1 = jnp.maximum(acc1 * s1 + bias, 0.0)
    y1q = jnp.clip(jnp.round(y1 / os1), -127, 127).astype(jnp.int8)
    ref = conv2d_int32(y1q, w2, (1, 1), (1, 1)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
