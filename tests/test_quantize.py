"""Quantizer unit tests (reference analogue: qtorch tests of quantize/dequantize)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.quant import (
    QTensor,
    compute_scale,
    dequantize,
    fake_quantize,
    pack_int4,
    quantize,
    unpack_int4,
)


def test_roundtrip_integer_valued_exact(rng):
    # Integer-valued inputs within [-127, 127] must survive int8 quantization
    # exactly when scale = 1 family (absmax=127 → scale 1).
    x = rng.integers(-127, 128, size=(4, 32)).astype(np.float32)
    x[0, 0] = 127.0  # pin absmax so scale is exactly 1.0
    q = quantize(jnp.asarray(x))
    assert q.values.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(dequantize(q)), x)


def test_per_tensor_scale():
    x = jnp.asarray([[-254.0, 127.0], [0.0, 3.0]])
    q = quantize(x)
    assert q.scale.shape == ()
    np.testing.assert_allclose(float(q.scale), 2.0)
    # note 127/2 = 63.5 -> 64 and 3/2 = 1.5 -> 2 (round-half-to-even)
    np.testing.assert_array_equal(np.asarray(q.values), [[-127, 64], [0, 2]])


def test_per_channel_scale(rng):
    x = rng.normal(size=(8, 5, 5, 16)).astype(np.float32)
    x[..., 3] *= 100.0  # one loud channel should not clobber the others
    q = quantize(jnp.asarray(x), axis=-1)
    assert q.scale.shape == (1, 1, 1, 16)
    deq = np.asarray(dequantize(q))
    err = np.abs(deq - x)
    # per-channel error bounded by scale/2 per channel
    bound = np.asarray(q.scale) / 2 + 1e-6
    assert np.all(err <= bound)


def test_quantize_clips_to_symmetric_range(rng):
    x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 50)
    q8 = quantize(x)
    assert int(jnp.min(q8.values)) >= -127 and int(jnp.max(q8.values)) <= 127
    q4 = quantize(x, bits=4)
    assert int(jnp.min(q4.values)) >= -7 and int(jnp.max(q4.values)) <= 7


def test_static_scale():
    x = jnp.asarray([[2.0, -4.0]])
    q = quantize(x, scale=jnp.asarray(2.0))
    np.testing.assert_array_equal(np.asarray(q.values), [[1, -2]])


def test_stochastic_rounding_unbiased():
    # 0.3 should round to 0 ~70% and 1 ~30% of the time (reference
    # quantization.py noise path).
    x = jnp.full((10000,), 0.3)
    q = quantize(x, scale=jnp.asarray(1.0), stochastic=True,
                 key=jax.random.key(0))
    mean = float(jnp.mean(q.values.astype(jnp.float32)))
    assert 0.25 < mean < 0.35


def test_ste_gradient():
    # d/dx fake_quantize ≈ 1 (straight-through), reference _Quantize.backward.
    g = jax.grad(lambda x: jnp.sum(fake_quantize(x, scale=jnp.asarray(1.0))))(
        jnp.asarray([0.3, 1.7, -2.2]))
    np.testing.assert_allclose(np.asarray(g), np.ones(3))


def test_qtensor_is_pytree():
    q = quantize(jnp.ones((4, 4)))
    leaves = jax.tree_util.tree_leaves(q)
    assert len(leaves) == 2  # values + scale, static fields excluded

    @jax.jit
    def deq(qt: QTensor):
        return qt.dequantize()

    np.testing.assert_allclose(np.asarray(deq(q)), np.ones((4, 4)))


@pytest.mark.parametrize("shape", [(16,), (4, 8), (3, 5, 6)])
def test_int4_pack_roundtrip(rng, shape):
    vals = jnp.asarray(rng.integers(-8, 8, size=shape), jnp.int8)
    packed = pack_int4(vals)
    assert packed.shape == (*shape[:-1], shape[-1] // 2)
    assert packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(vals))


def test_compute_scale_matches_manual(rng):
    x = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    np.testing.assert_allclose(
        float(compute_scale(x)), float(jnp.max(jnp.abs(x))) / 127, rtol=1e-6)
    pc = compute_scale(x, axis=1)
    assert pc.shape == (1, 16)


def test_fake_quantize_tree_dw_by_path():
    """Depthwise detection is by the 'dw' path key, not weight shape: a
    cin==1 stem conv must fake-quant at the requested low bit-width, while
    a 'dw' weight stays at 8 bits (deploy parity with mobilenet dw_bits)."""
    from lowbitdnn_project_tpu.train.qat import fake_quantize_tree

    key = jax.random.key(0)
    stem = jax.random.normal(key, (3, 3, 1, 8))       # grayscale stem, cin=1
    dw = jax.random.normal(key, (3, 3, 1, 16))        # depthwise by path
    tree = {"stem": {"w": stem}, "b0": {"dw": {"w": dw}}}
    out = fake_quantize_tree(tree, bits=4)
    # int4 has 15 levels -> the stem must land on a 15-level grid
    sq = np.asarray(out["stem"]["w"])
    assert len(np.unique(sq[..., 0])) <= 15
    # the dw weight keeps int8 resolution (more than 15 distinct levels)
    dq = np.asarray(out["b0"]["dw"]["w"])
    assert len(np.unique(dq)) > 15


def test_percentile_weight_clipping():
    """compute_scale(percentile=) clips per-channel ranges below absmax in
    the presence of outliers, and the quantize clip saturates them."""
    from lowbitdnn_project_tpu.quant import compute_scale

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    w = w.at[0, 0, 0, 0].set(50.0)
    s_abs = compute_scale(w, bits=4, axis=3)
    s_pct = compute_scale(w, bits=4, axis=3, percentile=99.0)
    assert float(s_pct[0, 0, 0, 0]) < float(s_abs[0, 0, 0, 0])
    # percentile never widens a range, and the outlier channel shrinks
    # far more than the clean ones
    assert np.all(np.asarray(s_pct) <= np.asarray(s_abs) + 1e-7)
    shrink = np.asarray(s_pct / s_abs).reshape(-1)
    assert shrink[0] < 0.5 and np.all(shrink[1:] > 0.5)
    q = quantize(w, bits=4, axis=3, scale=s_pct)
    assert int(jnp.max(jnp.abs(q.values))) <= 7
