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


def test_mobilenet_int8chain_jits(rng):
    params = mobilenet.init_params(jax.random.key(1), CFG)
    qparams = mobilenet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    scales = mobilenet.calibrate_act_scales(params, [x], CFG)
    f = jax.jit(lambda p, xx: mobilenet.apply_quantized_int8chain(
        p, xx, scales, CFG, backend="xla"))
    out = f(qparams, x)
    assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()
