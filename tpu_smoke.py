"""TPU smoke: compile + bit-assert the engine's core paths on the REAL chip.

The committed test suite pins CPU (tests/conftest.py); this script is the
on-device correctness artifact — runnable by the driver or any fresh
container (`python tpu_smoke.py`, ~1 min warm / a few min on cold compile;
graphs land in the committed .jax_cache).

Covers: quantize -> qconv2d (float + requant) -> qmax_pool2d -> qlinear
flow, the Pallas fused GEMM epilogue path, the flat pitched-layout conv
(kernels/conv_flat.py) and the fused bottleneck block (block_flat.py),
each asserted bit-exact against the XLA int32 oracle on device.
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    assert jax.default_backend() != "cpu", (
        "tpu_smoke must run on the TPU backend; got cpu")
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    from lowbitdnn_project_tpu import quantize
    from lowbitdnn_project_tpu.ops import qconv2d, qmax_pool2d, qlinear
    from lowbitdnn_project_tpu.ops.conv import conv2d_int32

    # --- int8 API flow, float epilogue vs float conv reference ---
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32) * .1)
    x_q, w_q = quantize(x), quantize(w, axis=3)
    out = qconv2d(x_q, w_q, padding=1, relu=True)
    ref = jnp.maximum(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-2, rel
    oq = qconv2d(x_q, w_q, padding=1, relu=True, out_scale=jnp.max(ref) / 127)
    p = qmax_pool2d(oq, 2, 2, 0)
    wl = quantize(jnp.asarray(
        rng.normal(size=(128, 10)).astype(np.float32) * .1), axis=1)
    feat = jnp.mean(p.values.astype(jnp.float32), axis=(1, 2)) * p.scale
    logits = qlinear(quantize(feat), wl)
    assert np.isfinite(np.asarray(logits)).all()
    print("api flow: ok (rel err %.4f)" % rel, flush=True)

    # --- Pallas fused GEMM: bit-exact vs XLA dot ---
    from lowbitdnn_project_tpu.kernels.matmul_int8 import (
        int8_matmul_fused, int8_matmul_xla)
    a = jnp.asarray(rng.integers(-50, 51, (256, 256)), jnp.int8)
    b = jnp.asarray(rng.integers(-50, 51, (256, 256)), jnp.int8)
    sc = jnp.full((256,), 0.01, jnp.float32)
    got = int8_matmul_fused(a, b, sc, requant=True,
                            out_scale=jnp.asarray(0.5, jnp.float32))
    ref = int8_matmul_xla(a, b, sc, requant=True,
                          out_scale=jnp.asarray(0.5, jnp.float32))
    assert (np.asarray(got) == np.asarray(ref)).all()
    print("pallas gemm: bit-exact", flush=True)

    # --- flat pitched-layout conv + fused bottleneck block ---
    from lowbitdnn_project_tpu.kernels.conv_flat import (
        conv_flat_int8, flat_meta, from_flat, to_flat)
    from lowbitdnn_project_tpu.kernels.block_flat import bottleneck_flat_int8

    xi = jnp.asarray(rng.integers(-5, 6, (2, 14, 14, 256)), jnp.int8)
    wi = jnp.asarray(rng.integers(-5, 6, (3, 3, 256, 256)), jnp.int8)
    m = flat_meta(2, 14, 14)
    got = from_flat(conv_flat_int8(
        to_flat(xi, m), wi, jnp.ones((256,), jnp.float32), meta=m, bm=512), m)
    refc = conv2d_int32(xi, wi, (1, 1), (1, 1)).astype(jnp.float32)
    assert (np.asarray(got) == np.asarray(refc)).all()
    print("conv_flat: bit-exact", flush=True)

    w1 = jnp.asarray(rng.integers(-5, 6, (256, 128)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-5, 6, (3, 3, 128, 128)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-5, 6, (128, 256)), jnp.int8)
    ones = jnp.ones((128,), jnp.float32)
    ob = bottleneck_flat_int8(
        to_flat(xi, m), w1, w2, w3,
        jnp.asarray([0.09, 0.12, 0.05, 0.15], jnp.float32),
        ones * .01, ones, ones * .01, ones,
        jnp.ones((256,)) * .01, jnp.ones((256,)), meta=m, bm=512)
    assert np.isfinite(
        np.asarray(from_flat(ob, m)).astype(np.float32)).all()
    print("block_flat: ok", flush=True)
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
