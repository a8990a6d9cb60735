"""MobileNet-V2 int8-chain tests."""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import mobilenet

CFG = mobilenet.MobileNetV2Config(
    stages=((1, 8, 1, 1), (6, 12, 2, 2), (6, 16, 2, 2)),
    num_classes=10, stem_ch=8, head_ch=64)


def test_mobilenet_calibration_sites(rng):
    params = mobilenet.init_params(jax.random.key(0), CFG)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    assert "stem" in scales and "head" in scales and "fc" in scales
    assert "b0.dw" in scales and "b0.project" in scales
    assert "b0.expand" not in scales          # first stage has t=1
    assert "b1.expand" in scales
    assert all(float(v) > 0 for v in scales.values())


def test_mobilenet_int8chain_tracks_fp32(rng):
    params = mobilenet.init_params(jax.random.key(1), CFG)
    qparams = mobilenet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    lf = mobilenet.apply_fp32(params, x, CFG)
    lq = mobilenet.apply_quantized_int8chain(qparams, x, scales, CFG,
                                             backend="xla")
    assert lq.shape == lf.shape
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.3, rel
    a = np.asarray(lq).ravel() - np.asarray(lq).mean()
    b = np.asarray(lf).ravel() - np.asarray(lf).mean()
    corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.9, corr


def test_mobilenet_dw_float_domain_tracks_int8(rng):
    """dw_domain="float" (bf16 depthwise between int8 pointwise convs) must
    agree with the all-int8 chain: dw in float is strictly MORE precise than
    int8 dw, so logits track both the int8 chain and fp32."""
    params = mobilenet.init_params(jax.random.key(1), CFG)
    qparams = mobilenet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    lf = mobilenet.apply_fp32(params, x, CFG)
    l8 = mobilenet.apply_quantized_int8chain(qparams, x, scales, CFG)
    ld = mobilenet.apply_quantized_int8chain(qparams, x, scales, CFG,
                                             dw_domain="float")
    rel_f = float(jnp.linalg.norm(ld - lf) / jnp.linalg.norm(lf))
    rel_8 = float(jnp.linalg.norm(ld - l8) / jnp.linalg.norm(l8))
    assert rel_f < 0.3, rel_f
    assert rel_8 < 0.3, rel_8
    assert (np.argmax(np.asarray(ld), -1)
            == np.argmax(np.asarray(l8), -1)).mean() >= 0.75


def test_mobilenet_stem_domains_agree(rng):
    """stem_domain="float" (the routed default: C=3 starves the int8 lane
    dim) must track the all-int8 stem variant; the float stem is strictly
    more precise, so both track fp32."""
    params = mobilenet.init_params(jax.random.key(2), CFG)
    qparams = mobilenet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    lf = mobilenet.apply_fp32(params, x, CFG)
    l_auto = mobilenet.apply_quantized_int8chain(qparams, x, scales, CFG)
    l_s8 = mobilenet.apply_quantized_int8chain(qparams, x, scales, CFG,
                                               stem_domain="int8")
    for lq in (l_auto, l_s8):
        rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
        assert rel < 0.3, rel
    assert (np.argmax(np.asarray(l_auto), -1)
            == np.argmax(np.asarray(l_s8), -1)).mean() >= 0.75


def test_mobilenet_int8chain_jits(rng):
    params = mobilenet.init_params(jax.random.key(1), CFG)
    qparams = mobilenet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    f = jax.jit(lambda p, xx: mobilenet.apply_quantized_int8chain(
        p, xx, scales, CFG, backend="xla"))
    out = f(qparams, x)
    assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()


def test_mobilenet_chain_act_unsigned(rng):
    """uint8 activations at the post-relu6 sites: logits track fp32 at
    least as well as the symmetric chain (finer one-sided grids)."""
    import numpy as np
    from lowbitdnn_project_tpu.models import mobilenet

    cfg = mobilenet.MobileNetV2Config(
        stages=((1, 16, 1, 1), (6, 24, 2, 2)), num_classes=10,
        stem_ch=16, head_ch=64)
    params = mobilenet.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref = mobilenet.apply_fp32(params, x, cfg)
    scales = mobilenet.calibrate_act_scales(params, [x], cfg)
    qp = mobilenet.quantize_params(params, cfg)
    sym = mobilenet.apply_quantized_int8chain(qp, x, scales, cfg,
                                              backend="xla")
    asym = mobilenet.apply_quantized_int8chain(qp, x, scales, cfg,
                                               backend="xla",
                                               act_unsigned=True)
    rn = float(jnp.linalg.norm(ref))
    e_s = float(jnp.linalg.norm(sym - ref)) / rn
    e_a = float(jnp.linalg.norm(asym - ref)) / rn
    assert e_a <= e_s * 1.25 + 1e-4, (e_a, e_s)
    assert e_a < 0.2
