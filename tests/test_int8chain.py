"""Calibration + fully-int8-chained inference tests (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet

TINY = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                           num_classes=10, width=8)


def test_calibration_covers_all_sites(rng):
    params = resnet.init_params(jax.random.key(0), TINY)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], TINY)
    # conv1 + 4 stages x (conv1,conv2,conv3 [+downsample]) + fc
    assert "conv1" in scales and "fc" in scales
    assert "layer1.0.conv2" in scales and "layer4.0.downsample" in scales
    assert all(float(s) > 0 for s in scales.values())
    # absmax semantics: input-site scale matches the true absmax / 127
    np.testing.assert_allclose(
        float(scales["conv1"]), float(jnp.max(jnp.abs(x))) / 127, rtol=1e-5)


def test_int8chain_tracks_fp32(rng):
    params = resnet.init_params(jax.random.key(1), TINY)
    qparams = resnet.quantize_params(params, TINY)
    xc = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [xc], TINY)
    lf = resnet.apply_fp32(params, xc, TINY)
    lq = resnet.apply_quantized_int8chain(qparams, xc, scales, TINY,
                                          backend="xla")
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.25, rel
    agree = float(jnp.mean(
        (jnp.argmax(lq, -1) == jnp.argmax(lf, -1)).astype(jnp.float32)))
    assert agree >= 0.75, agree


def test_int8chain_jits(rng):
    params = resnet.init_params(jax.random.key(1), TINY)
    qparams = resnet.quantize_params(params, TINY)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], TINY)
    f = jax.jit(lambda p, xx: resnet.apply_quantized_int8chain(
        p, xx, scales, TINY, backend="xla"))
    out = f(qparams, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_int8chain_accepts_prequantized_input(rng):
    """Serving boundary: QTensor int8 input == float input quantized inside."""
    from lowbitdnn_project_tpu.quant import quantize

    params = resnet.init_params(jax.random.key(1), TINY)
    qparams = resnet.quantize_params(params, TINY)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], TINY)
    ref = resnet.apply_quantized_int8chain(qparams, x, scales, TINY,
                                           backend="xla")
    x_q = quantize(x, scale=scales["conv1"])
    got = resnet.apply_quantized_int8chain(qparams, x_q, scales, TINY,
                                           backend="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_int8chain_flat_block_backend(rng):
    """block_backend='flat' (fused bottleneck kernel, flat layout) matches
    the per-conv chain. Width chosen so stage 3 blocks are fusable
    (C=512, Cmid=128); layer boundaries exercise to_flat/from_flat."""
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 2, 1), bottleneck=True,
                              num_classes=10, width=32)
    params = resnet.init_params(jax.random.key(2), cfg)
    qparams = resnet.quantize_params(params, cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    ref = resnet.apply_quantized_int8chain(
        qparams, x, scales, cfg, backend="xla", act_dtype=jnp.float32)
    got = resnet.apply_quantized_int8chain(
        qparams, x, scales, cfg, backend="xla", act_dtype=jnp.float32,
        block_backend="flat", interpret=True)
    # identical int8 chains up to reciprocal-vs-division rounding at the
    # requant boundary; logits must be numerically indistinguishable
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()


def test_int8chain_w4a8_1x1_routing(rng):
    """Serving W4A8 path: prepacked int4 1x1 weights through the Pallas
    W4A8 kernel == the same int4 weights through the XLA conv path."""
    from lowbitdnn_project_tpu.models.layers import prepack_w4a8_1x1

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=32)
    params = resnet.init_params(jax.random.key(4), cfg)
    qparams = resnet.quantize_params(params, cfg, bits=4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)

    qp_packed = prepack_w4a8_1x1(qparams, min_cin=128)
    n_packed = sum(
        1 for leaf in jax.tree_util.tree_leaves(
            qp_packed, is_leaf=lambda n: hasattr(n, "w4pack"))
        if getattr(leaf, "w4pack", None) is not None)
    assert n_packed >= 4, n_packed

    ref = resnet.apply_quantized_int8chain(
        qparams, x, scales, cfg, backend="xla", act_dtype=jnp.float32,
        use_w4a8_1x1=False)
    got = resnet.apply_quantized_int8chain(
        qp_packed, x, scales, cfg, backend="xla", act_dtype=jnp.float32,
        use_w4a8_1x1=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()


def test_int8chain_stop_after_stage(rng):
    """Feature-extraction exits: int8 QTensor per stage, each prefix
    consistent with the full chain (same ops up to the cut)."""
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    params = resnet.init_params(jax.random.key(0), TINY)
    qparams = resnet.quantize_params(params, TINY)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], TINY)
    w = TINY.width
    expect = {0: (2, 16, 16, w), 1: (2, 16, 16, 4 * w),
              2: (2, 8, 8, 8 * w), 3: (2, 4, 4, 16 * w),
              4: (2, 2, 2, 32 * w)}
    feats = {}
    for st, shape in expect.items():
        f = resnet.apply_quantized_int8chain(qparams, x, scales, TINY,
                                             stop_after_stage=st)
        assert isinstance(f, QTensor) and f.values.dtype == jnp.int8
        assert f.shape == shape, (st, f.shape)
        feats[st] = f
    # stage-0 exit == stem output consumed by the stage-1 prefix: re-running
    # the full chain must reproduce the logits (the hook changes no math)
    y_full = resnet.apply_quantized_int8chain(qparams, x, scales, TINY)
    assert y_full.shape == (2, TINY.num_classes)


def test_int8chain_skip_stem_slices_exactly(rng):
    """skip_stem: feeding the stop_after_stage=0 map back in reproduces the
    full classic-stem chain bit-exactly (the stem half of the
    pipeline-slicing hooks; bench/probes/stem_inchain.py relies on it)."""
    import numpy as np
    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=10, width=16)
    params = resnet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    qp = resnet.quantize_params(params, cfg)
    full = resnet.apply_quantized_int8chain(qp, x, scales, cfg,
                                            backend="xla",
                                            stem_backend="classic")
    feat = resnet.apply_quantized_int8chain(qp, x, scales, cfg,
                                            backend="xla",
                                            stem_backend="classic",
                                            stop_after_stage=0)
    rest = resnet.apply_quantized_int8chain(qp, feat, scales, cfg,
                                            backend="xla", skip_stem=True)
    np.testing.assert_array_equal(np.asarray(rest), np.asarray(full))
