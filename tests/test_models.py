"""Model zoo tests: FP32 vs INT8 agreement, BN folding exactness, shapes.

Small image sizes + a narrow ResNet config keep CPU runtime sane; the logic
(block wiring, folding, quantized epilogues) is size-independent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbitdnn_project_tpu.models import mnist, mobilenet, resnet
from lowbitdnn_project_tpu.models.layers import fold_bn

TINY_R18 = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=False,
                               num_classes=10, width=8)
TINY_R50 = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                               num_classes=10, width=8)


def test_fold_bn_exact(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 2, 8).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=8).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=8).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2, 8).astype(np.float32))

    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = (conv(x, w) - mean) * (gamma / jnp.sqrt(var + 1e-5)) + beta
    wf, bf = fold_bn(w, None, gamma, beta, mean, var)
    got = conv(x, wf) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", [TINY_R18, TINY_R50], ids=["r18", "r50"])
def test_resnet_fp32_vs_int8_topk_agreement(rng, cfg):
    key = jax.random.key(0)
    params = resnet.init_params(key, cfg)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    logits_f = resnet.apply_fp32(params, x, cfg)
    qparams = resnet.quantize_params(params, cfg)
    logits_q = resnet.apply_quantized(qparams, x, cfg, backend="xla")
    assert logits_f.shape == logits_q.shape == (4, cfg.num_classes)
    # int8 should track fp32 closely: same argmax on most inputs + small
    # relative error (accuracy-parity proxy; no ImageNet data in image)
    rel = float(jnp.linalg.norm(logits_q - logits_f) /
                jnp.linalg.norm(logits_f))
    assert rel < 0.15, rel
    agree = float(jnp.mean((jnp.argmax(logits_q, -1) ==
                            jnp.argmax(logits_f, -1)).astype(jnp.float32)))
    assert agree >= 0.75, agree


def test_mobilenet_fp32_vs_int8(rng):
    cfg = mobilenet.MobileNetV2Config(
        stages=((1, 8, 1, 1), (6, 12, 2, 2), (6, 16, 2, 2)),
        num_classes=10, stem_ch=8, head_ch=64)
    params = mobilenet.init_params(jax.random.key(1), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    logits_f = mobilenet.apply_fp32(params, x, cfg)
    logits_q = mobilenet.apply_quantized(qparams := mobilenet.quantize_params(
        params, cfg), x, cfg, backend="xla")
    assert logits_f.shape == logits_q.shape == (2, 10)
    rel = float(jnp.linalg.norm(logits_q - logits_f) /
                jnp.linalg.norm(logits_f))
    assert rel < 0.2, rel


def test_mnist_forward_shapes():
    params = mnist.init_params(jax.random.key(2))
    x = jnp.ones((4, 28, 28, 1), jnp.float32) * 0.5
    logits = mnist.apply(params, x)
    assert logits.shape == (4, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_deep_resnet_configs(rng):
    """ResNet-101/152 named configs: torchvision-depth structure + a narrow
    deep-stage forward (the 23/36-block stage-3 wiring is what's new)."""
    # conv count = stem + 3 convs/bottleneck + 4 downsample projections
    for cfg, blocks, n_convs in ((resnet.RESNET101, (3, 4, 23, 3), 104),
                                 (resnet.RESNET152, (3, 8, 36, 3), 155)):
        assert cfg.stage_blocks == blocks and cfg.bottleneck
        params = resnet.init_params(jax.random.key(0), cfg)
        convs = [a for a in jax.tree_util.tree_leaves(params)
                 if hasattr(a, "ndim") and a.ndim == 4]
        assert len(convs) == n_convs, (cfg.stage_blocks, len(convs))

    narrow = resnet.ResNetConfig(stage_blocks=(1, 1, 23, 1), bottleneck=True,
                                 num_classes=10, width=8)
    params = resnet.init_params(jax.random.key(3), narrow)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    logits_f = resnet.apply_fp32(params, x, narrow)
    qparams = resnet.quantize_params(params, narrow)
    logits_q = resnet.apply_quantized(qparams, x, narrow, backend="xla")
    assert logits_f.shape == logits_q.shape == (2, 10)
    rel = float(jnp.linalg.norm(logits_q - logits_f) /
                jnp.linalg.norm(logits_f))
    assert rel < 0.25, rel  # 26 quantized blocks of noise accumulation


def test_resnet_jit_compiles(rng):
    params = resnet.init_params(jax.random.key(0), TINY_R18)
    qparams = resnet.quantize_params(params, TINY_R18)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    f = jax.jit(lambda p, x: resnet.apply_quantized(p, x, TINY_R18,
                                                    backend="xla"))
    out1 = f(qparams, x)
    out2 = f(qparams, x)  # cached call
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
