"""Stem v2 (8-plane, K=288) vs v3 (6-plane, K=216): TPU correctness +
interleaved standalone timing across batches."""
import sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.quant import quantize
from lowbitdnn_project_tpu.quant.qtensor import QTensor
from lowbitdnn_project_tpu.kernels.stem_fused import stem_conv_pool_fused
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

rng = np.random.default_rng(0)
w = quantize(jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32), axis=3)
b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

xs = QTensor(values=jnp.asarray(rng.integers(-100, 101, (2, 224, 224, 3)), jnp.int8),
             scale=jnp.float32(0.02))
g2 = stem_conv_pool_fused(xs, w, b, 0.05, version=2)
g3 = stem_conv_pool_fused(xs, w, b, 0.05, version=3)
d = np.abs(np.asarray(g2.values, np.int32) - np.asarray(g3.values, np.int32))
print(f"TPU v2-vs-v3: maxdiff={d.max()} n_diff={(d > 0).sum()}")
assert d.max() <= 1

for batch in (8, 32, 64):
    x8 = jnp.asarray(rng.integers(-100, 101, (batch, 224, 224, 3)), jnp.int8)
    def mk(v):
        def step(c, wv, bv):
            out = stem_conv_pool_fused(
                QTensor(values=c, scale=jnp.float32(0.02)),
                QTensor(values=wv.values, scale=wv.scale, bits=8, axis=3),
                bv, 0.05, version=v)
            return chain_via_scalar(c, out.values)
        return step
    best = {}
    for _ in range(2):
        for v in (2, 3):
            t = chained_device_time(mk(v), x8, lo=20, hi=220, args=(w, b))
            best[v] = min(best.get(v, 1e9), t)
    print(f"b{batch}: v2 {best[2]*1e6:7.1f} us   v3 {best[3]*1e6:7.1f} us   "
          f"v2/v3 = {best[2]/best[3]:.3f}x")
