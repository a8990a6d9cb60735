"""Fused layer1 bottleneck kernel (kernels/block_l1.py, lab generation v5):
interpret-mode parity vs the classic float-add chain block.

The kernel is a measured NEGATIVE result (loses 2.8x to in-chain XLA, see
module docstring) kept as lab history; these tests pin its correctness so
the lab record stays reproducible.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lowbitdnn_project_tpu.quant import quantize, QTensor
from lowbitdnn_project_tpu.ops import qconv2d
from lowbitdnn_project_tpu.models.layers import QConvParams
from lowbitdnn_project_tpu.kernels.block_l1 import bottleneck_l1_fused


def _mk(rng, kh, kw, ci, co):
    return QConvParams(
        weight=quantize(jnp.asarray(
            rng.normal(size=(kh, kw, ci, co)) * 0.2, jnp.float32), axis=3),
        bias=jnp.asarray(rng.normal(size=(co,)), jnp.float32))


def _classic(x_q, p1, p2, p3, s2, s3, s_out, ds=None):
    """The chain's float-add bottleneck block (apply_quantized_int8chain
    body, add_domain="float", act_dtype=bf16), op order bit-for-bit."""
    h = qconv2d(x_q, p1.weight, p1.bias, relu=True, out_scale=s2)
    h = qconv2d(h, p2.weight, p2.bias, padding=1, relu=True, out_scale=s3)
    h = qconv2d(h, p3.weight, p3.bias, relu=False, out_dtype=jnp.bfloat16)
    if ds is not None:
        ident = qconv2d(x_q, ds.weight, ds.bias, relu=False,
                        out_dtype=jnp.bfloat16)
    else:
        ident = (x_q.values.astype(jnp.float32)
                 * x_q.scale).astype(jnp.bfloat16)
    out_f = jnp.maximum(h + ident, 0.0)
    return quantize(out_f, scale=jnp.asarray(s_out, jnp.float32))


@pytest.mark.parametrize("a,with_ds", [(256, False), (64, True), (256, True)])
def test_block_l1_matches_classic(a, with_ds):
    rng = np.random.default_rng(a + with_ds)
    x_q = quantize(jnp.asarray(rng.normal(size=(2, 56, 56, a)), jnp.float32))
    p1, p2, p3 = (_mk(rng, 1, 1, a, 64), _mk(rng, 3, 3, 64, 64),
                  _mk(rng, 1, 1, 64, 256))
    ds = _mk(rng, 1, 1, a, 256) if with_ds else None
    ref = _classic(x_q, p1, p2, p3, 0.05, 0.06, 0.07, ds)
    got = bottleneck_l1_fused(x_q, p1, p2, p3, 0.05, 0.06, 0.07, ds,
                              interpret=True)
    assert got.values.dtype == jnp.int8
    assert float(got.scale) == float(ref.scale)
    # |delta| <= 1 at requant half-boundaries (fma order); on real TPU the
    # kernel measured maxdiff 0 (scratch/block_l1_probe.py)
    diff = np.abs(np.asarray(ref.values, np.int32)
                  - np.asarray(got.values, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-4


def test_block_l1_shape_guards():
    rng = np.random.default_rng(0)
    p1, p2, p3 = (_mk(rng, 1, 1, 64, 64), _mk(rng, 3, 3, 64, 64),
                  _mk(rng, 1, 1, 64, 256))
    x_q = quantize(jnp.asarray(rng.normal(size=(1, 28, 28, 64)), jnp.float32))
    with pytest.raises(ValueError, match="56x56"):
        bottleneck_l1_fused(x_q, p1, p2, p3, 0.05, 0.06, 0.07,
                            interpret=True)
    x_q = quantize(jnp.asarray(rng.normal(size=(1, 56, 56, 64)), jnp.float32))
    p2_bad = _mk(rng, 3, 3, 128, 128)
    with pytest.raises(ValueError, match="cmid=64"):
        bottleneck_l1_fused(x_q, p1, p2_bad, p3, 0.05, 0.06, 0.07,
                            interpret=True)
