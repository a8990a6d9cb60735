"""Native C++ runtime tests: oracle parity, pipeline correctness."""
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.ops import conv2d_int32
from lowbitdnn_project_tpu.quant import pack_int4, unpack_int4
from lowbitdnn_project_tpu.runtime import (
    load,
    pack_int4_native,
    preprocess_quantize,
    refconv2d_int8,
    unpack_int4_native,
)


def test_native_lib_loads():
    lib = load()
    assert lib.omp_max_threads() >= 1


def test_native_conv_matches_xla(rng, conv_shape):
    n, c, k, h, w, f, s, p = conv_shape
    x = rng.integers(-50, 51, (n, h, w, c)).astype(np.int8)
    wt = rng.integers(-50, 51, (f, f, c, k)).astype(np.int8)
    got = refconv2d_int8(x, wt, (s, s), (p, p))
    want = np.asarray(conv2d_int32(jnp.asarray(x), jnp.asarray(wt),
                                   (s, s), (p, p)))
    np.testing.assert_array_equal(got, want)


def test_native_conv_groups(rng):
    n, c, h, w = 2, 8, 6, 6
    x = rng.integers(-20, 21, (n, h, w, c)).astype(np.int8)
    wt = rng.integers(-20, 21, (3, 3, 1, c)).astype(np.int8)
    got = refconv2d_int8(x, wt, (1, 1), (1, 1), groups=c)
    want = np.asarray(conv2d_int32(jnp.asarray(x), jnp.asarray(wt),
                                   (1, 1), (1, 1), groups=c))
    np.testing.assert_array_equal(got, want)


def test_preprocess_quantize(rng):
    imgs = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    scale = 0.02
    got = preprocess_quantize(imgs, mean, std, scale)
    norm = (imgs.astype(np.float32) / 255.0 - mean) / std
    want = np.clip(np.round(norm / scale), -127, 127).astype(np.int8)
    # nearbyintf ties-to-even matches numpy round
    np.testing.assert_array_equal(got, want)


def test_native_int4_matches_jax(rng):
    vals = rng.integers(-8, 8, (4, 16)).astype(np.int8)
    packed_native = pack_int4_native(vals)
    packed_jax = np.asarray(pack_int4(jnp.asarray(vals)))
    np.testing.assert_array_equal(packed_native, packed_jax)
    np.testing.assert_array_equal(unpack_int4_native(packed_native), vals)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(jnp.asarray(packed_native))), vals)


def test_prefetch_loader_matches_sync(rng):
    """The threaded loader's output equals the synchronous
    preprocess_quantize, batch-for-batch in submission order."""
    from lowbitdnn_project_tpu.runtime import PrefetchLoader, preprocess_quantize

    mean = np.asarray([0.4, 0.45, 0.5], np.float32)
    std = np.asarray([0.2, 0.25, 0.3], np.float32)
    raws = [rng.integers(0, 256, (n, 16, 16, 3)).astype(np.uint8)
            for n in (4, 2, 6, 1)]
    with PrefetchLoader(mean, std, 0.02, hw=(16, 16), n_threads=3,
                        capacity=2) as ld:
        for r in raws:
            ld.submit(r)
        outs = [ld.get() for _ in raws]
    for r, o in zip(raws, outs):
        ref = preprocess_quantize(r, mean, std, 0.02)
        np.testing.assert_array_equal(ref, o)


def test_prefetch_loader_interleaved(rng):
    """submit/get interleaving with backpressure keeps FIFO order."""
    from lowbitdnn_project_tpu.runtime import PrefetchLoader, preprocess_quantize

    mean = np.zeros((3,), np.float32) + 0.5
    std = np.ones((3,), np.float32)
    with PrefetchLoader(mean, std, 0.01, hw=(8, 8), n_threads=2,
                        capacity=1) as ld:
        raws = []
        for i in range(6):
            r = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
            raws.append(r)
            ld.submit(r)
            if i % 2:
                o = ld.get()
                ref = preprocess_quantize(raws.pop(0), mean, std, 0.01)
                np.testing.assert_array_equal(ref, o)
        while raws:
            np.testing.assert_array_equal(
                preprocess_quantize(raws.pop(0), mean, std, 0.01), ld.get())
        assert ld.pending() == 0
