"""Distributed-layer tests on the 8-virtual-device CPU mesh.

What the reference entirely lacks (SURVEY.md §2: single-GPU) and the
BASELINE north star requires: TP(K)-sharded packed int8 weights + DP batch
sharding must produce bit-identical results to the unsharded graph (XLA
inserts the collectives; numerics must not change).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.parallel import (
    make_mesh,
    replicate_qparams,
    shard_batch,
    shard_qparams_tp,
)

TINY = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                           num_classes=16, width=16)


@pytest.fixture(scope="module")
def setup():
    params = resnet.init_params(jax.random.key(0), TINY)
    qparams = resnet.quantize_params(params, TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], TINY)
    ref = resnet.apply_quantized_int8chain(qparams, x, scales, TINY,
                                           backend="xla")
    return params, qparams, x, scales, ref


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_int8chain_bit_identical(setup, dp, tp):
    params, qparams, x, scales, ref = setup
    mesh = make_mesh(dp=dp, tp=tp)
    with jax.set_mesh(mesh):
        qp_s = shard_qparams_tp(qparams, mesh) if tp > 1 else \
            replicate_qparams(qparams, mesh)
        x_s = shard_batch(x, mesh)
        out = jax.jit(lambda p, xx: resnet.apply_quantized_int8chain(
            p, xx, scales, TINY, backend="xla"))(qp_s, x_s)
    # integer graph -> sharding must not change a single bit of the int8
    # chain; only the final float linear may see reduction-order jitter
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_weight_sharding_layout(setup):
    params, qparams, x, scales, ref = setup
    mesh = make_mesh(dp=2, tp=4)
    qp_s = shard_qparams_tp(qparams, mesh)
    w = qp_s["layer1"][0]["conv1"].weight
    # K axis (3) sharded over "model"
    spec = w.values.sharding.spec
    assert spec[3] == "model", spec
    # per-channel scale sharded alongside
    assert w.scale.sharding.spec[3] == "model"
