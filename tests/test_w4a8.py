"""W4A8 kernel tests: packed-weight GEMM bit-exact vs unpacked oracle;
ResNet INT4-weight accuracy envelope (BASELINE config 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
    pack_int4_rows,
    w4a8_matmul_fused,
    w4a8_matmul_xla,
)
from lowbitdnn_project_tpu.models import resnet

TINY = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                           num_classes=10, width=8)


def test_pack_rows_roundtrip(rng):
    # halves-concat pairing: within a K-block, lo nibbles = first half
    # rows, hi nibbles = second half (no interleave at unpack time)
    w = jnp.asarray(rng.integers(-7, 8, (16, 8)), jnp.int8)
    p = pack_int4_rows(w, block_k=16)
    assert p.shape == (8, 8) and p.dtype == jnp.uint8
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(w[:8]))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(w[8:]))


@pytest.mark.parametrize("m,k,n", [(8, 16, 32), (64, 256, 128), (100, 130, 60)],
                         ids=str)
def test_w4a8_matches_oracle(rng, m, k, n):
    if k % 2:
        k += 1
    a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w4 = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (n,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    got = w4a8_matmul_fused(a, pack_int4_rows(w4), scale, bias,
                            interpret=True)
    want = w4a8_matmul_xla(a, w4, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_w4a8_requant(rng):
    m, k, n = 32, 64, 64
    a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w4 = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
    scale = jnp.full((n,), 0.02, jnp.float32)
    got = w4a8_matmul_fused(a, pack_int4_rows(w4), scale, None,
                            jnp.asarray(0.4), relu=True, requant=True,
                            interpret=True)
    want = w4a8_matmul_xla(a, w4, scale, None, jnp.asarray(0.4),
                           relu=True, requant=True)
    d = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert d.max() <= 1


def test_resnet_int4_weights_accuracy(rng):
    """INT4 weight-only (INT8 activations) must stay within the looser
    BASELINE envelope (<=1.5% top-1 on ImageNet; proxy: rel err + agreement)."""
    params = resnet.init_params(jax.random.key(0), TINY)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    lf = resnet.apply_fp32(params, x, TINY)
    q4 = resnet.quantize_params(params, TINY, bits=4)
    l4 = resnet.apply_quantized(q4, x, TINY, backend="xla")
    rel = float(jnp.linalg.norm(l4 - lf) / jnp.linalg.norm(lf))
    assert rel < 0.5, rel
    # random-init logits are near-uniform, so argmax agreement is noise;
    # assert the logit landscape still correlates strongly instead
    a = np.asarray(l4).ravel() - np.asarray(l4).mean()
    b = np.asarray(lf).ravel() - np.asarray(lf).mean()
    corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.7, corr
