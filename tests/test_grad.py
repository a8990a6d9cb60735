"""Quantized backward tests — int8 gradients track float gradients.

Reference evidence: tests/main.py:54-66 prints max/rel grad diffs for the
int8-as-conv backward and records close agreement; gradient closeness is
asserted at qconv2d_test.py:51-56 with small tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.ops.conv import DIMSPEC
from lowbitdnn_project_tpu.ops.grad import make_qconv2d_train


def _float_conv(x, w, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=DIMSPEC)


def test_forward_matches_float_closely(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.1)
    qconv = make_qconv2d_train(padding=1)
    got = qconv(x, w)
    want = _float_conv(x, w)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel


def test_int8_grads_track_float_grads(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.1)
    qconv = make_qconv2d_train(padding=1, quantized_grads=True)

    def loss_q(x, w):
        return jnp.sum(qconv(x, w) ** 2) / x.size

    def loss_f(x, w):
        return jnp.sum(_float_conv(x, w) ** 2) / x.size

    gxq, gwq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gxf, gwf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for gq, gf, name in [(gxq, gxf, "dx"), (gwq, gwf, "dw")]:
        rel = float(jnp.linalg.norm(gq - gf) / (jnp.linalg.norm(gf) + 1e-9))
        assert rel < 0.08, (name, rel)


def test_float_ste_backward_exact(rng):
    """quantized_grads=False: backward must equal the float conv VJP
    (same transposed-conv algebra, no grad quantization)."""
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32) * 0.2)
    qconv = make_qconv2d_train(padding=1, quantized_grads=False)
    g = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))

    _, vjp_q = jax.vjp(qconv, x, w)
    _, vjp_f = jax.vjp(lambda x, w: _float_conv(x, w), x, w)
    gxq, gwq = vjp_q(g)
    gxf, gwf = vjp_f(g)
    np.testing.assert_allclose(np.asarray(gxq), np.asarray(gxf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gwq), np.asarray(gwf),
                               rtol=1e-4, atol=1e-5)


def test_training_reduces_loss(rng):
    """A few SGD steps through the quantized conv must reduce a toy loss."""
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 8)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32) * 0.1)
    qconv = make_qconv2d_train(padding=1)

    @jax.jit
    def step(w):
        loss, gw = jax.value_and_grad(
            lambda w: jnp.mean((qconv(x, w) - target) ** 2))(w)
        return w - 0.05 * gw, loss

    losses = []
    for _ in range(10):
        w, loss = step(w)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_grad_weight_chunked_matches_unchunked(rng):
    """Shapes whose N*OH*OW exceeds the provable-int32 bound take the
    batch-chunked grad_weight path; with small-magnitude values (no
    overflow either way) it must equal the single-conv formulation."""
    from lowbitdnn_project_tpu.ops.conv import conv2d_int32

    n, hw, c, k = 180, 28, 2, 3          # 180*28*28 = 141k > 133,152 bound
    x = jnp.asarray(rng.normal(size=(n, hw, hw, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, c, k)).astype(np.float32)) * 0.1
    qconv = make_qconv2d_train(padding=1, quantized_grads=True)
    out, vjp = jax.vjp(qconv, x, w)
    _, gw = vjp(jnp.ones_like(out) * 1e-3)

    # reference: the exact same quantization + ONE int32 conv (values are
    # tiny, so the unchunked accumulation cannot wrap here)
    from lowbitdnn_project_tpu.ops.grad import _quant
    gq8, gs = _quant(jnp.ones_like(out) * 1e-3)
    xq, xs = _quant(x)
    ref = conv2d_int32(
        xq.transpose(3, 1, 2, 0), gq8.transpose(1, 2, 0, 3), (1, 1),
        (1, 1)).astype(jnp.float32).transpose(1, 2, 0, 3) * (xs * gs)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
