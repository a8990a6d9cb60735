"""Stem v2 (8-plane, K=288) vs v3 (6-plane, K=216) x row-pairs (14 / 28):
TPU correctness + interleaved standalone timing across batches.

All variants run in ONE process, interleaved across 2 passes with a
per-variant min (relay clock drifts >10% over minutes — CLAUDE.md)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.quant import quantize
from lowbitdnn_project_tpu.quant.qtensor import QTensor
from lowbitdnn_project_tpu.kernels.stem_fused import stem_conv_pool_fused
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

VARIANTS = [(2, 14), (2, 28), (3, 14), (3, 28)]

rng = np.random.default_rng(0)
w = quantize(jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32), axis=3)
b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

xs = QTensor(values=jnp.asarray(rng.integers(-100, 101, (2, 224, 224, 3)), jnp.int8),
             scale=jnp.float32(0.02))
ref = stem_conv_pool_fused(xs, w, b, 0.05, version=2, row_pairs=14)
for v, rp in VARIANTS[1:]:
    g = stem_conv_pool_fused(xs, w, b, 0.05, version=v, row_pairs=rp)
    d = np.abs(np.asarray(ref.values, np.int32) - np.asarray(g.values, np.int32))
    print(f"TPU v{v}/rp{rp} vs v2/rp14: maxdiff={d.max()} n_diff={(d > 0).sum()}")
    assert d.max() <= 1

for batch in (8, 32, 64):
    x8 = jnp.asarray(rng.integers(-100, 101, (batch, 224, 224, 3)), jnp.int8)
    def mk(v, rp):
        def step(c, wv, bv):
            out = stem_conv_pool_fused(
                QTensor(values=c, scale=jnp.float32(0.02)),
                QTensor(values=wv.values, scale=wv.scale, bits=8, axis=3),
                bv, 0.05, version=v, row_pairs=rp)
            return chain_via_scalar(c, out.values)
        return step
    # iteration counts sized for a >=100 ms delta window (CLAUDE.md floor:
    # sub-100ms deltas measure relay jitter — a "9.1 us" b8 stem was seen)
    hi = {8: 2520, 32: 820, 64: 470}[batch]
    best = {}
    for _ in range(2):
        for v, rp in VARIANTS:
            t = chained_device_time(mk(v, rp), x8, lo=20, hi=hi, args=(w, b))
            best[(v, rp)] = min(best.get((v, rp), 1e9), t)
    cells = "   ".join(f"v{v}/rp{rp} {best[(v, rp)]*1e6:7.1f}" for v, rp in VARIANTS)
    win = min(best, key=best.get)
    print(f"b{batch}: {cells} us   winner v{win[0]}/rp{win[1]}")
