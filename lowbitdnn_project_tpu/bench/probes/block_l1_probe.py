"""block_l1 TPU correctness + standalone interleaved timing vs classic."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.quant import quantize, QTensor
from lowbitdnn_project_tpu.ops import qconv2d
from lowbitdnn_project_tpu.models.layers import QConvParams
from lowbitdnn_project_tpu.kernels.block_l1 import bottleneck_l1_fused
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

rng = np.random.default_rng(0)
def mk(kh, kw, ci, co):
    return QConvParams(
        weight=quantize(jnp.asarray(rng.normal(size=(kh, kw, ci, co)) * 0.2, jnp.float32), axis=3),
        bias=jnp.asarray(rng.normal(size=(co,)), jnp.float32))

def classic(x_q, p1, p2, p3, s2, s3, s_out, ds=None):
    h = qconv2d(x_q, p1.weight, p1.bias, relu=True, out_scale=s2)
    h = qconv2d(h, p2.weight, p2.bias, padding=1, relu=True, out_scale=s3)
    h = qconv2d(h, p3.weight, p3.bias, relu=False, out_dtype=jnp.bfloat16)
    if ds is not None:
        ident = qconv2d(x_q, ds.weight, ds.bias, relu=False, out_dtype=jnp.bfloat16)
    else:
        ident = (x_q.values.astype(jnp.float32) * x_q.scale).astype(jnp.bfloat16)
    out_f = jnp.maximum(h + ident, 0.0)
    return quantize(out_f, scale=jnp.asarray(s_out, jnp.float32))

# correctness on TPU
for a, with_ds, seed in ((256, False, 1), (64, True, 2)):
    rng = np.random.default_rng(seed)
    x_q = quantize(jnp.asarray(rng.normal(size=(2, 56, 56, a)), jnp.float32))
    p1, p2, p3 = mk(1, 1, a, 64), mk(3, 3, 64, 64), mk(1, 1, 64, 256)
    ds = mk(1, 1, a, 256) if with_ds else None
    ref = classic(x_q, p1, p2, p3, 0.05, 0.06, 0.07, ds)
    got = bottleneck_l1_fused(x_q, p1, p2, p3, 0.05, 0.06, 0.07, ds)
    diff = np.abs(np.asarray(ref.values, np.int32) - np.asarray(got.values, np.int32))
    print(f"TPU A={a} ds={with_ds}: maxdiff={diff.max()} n_diff={(diff>0).sum()}")
    assert diff.max() <= 1

# standalone timing, l1.1-shape (A=256, no ds), interleaved min-of-2
for batch in (8, 32):
    rng = np.random.default_rng(9)
    x_q = quantize(jnp.asarray(rng.normal(size=(batch, 56, 56, 256)), jnp.float32))
    p1, p2, p3 = mk(1, 1, 256, 64), mk(3, 3, 64, 64), mk(1, 1, 64, 256)
    def step_c(c):
        out = classic(QTensor(values=c, scale=x_q.scale), p1, p2, p3, 0.05, 0.06, 0.07)
        return chain_via_scalar(c, out.values)
    def step_f(c):
        out = bottleneck_l1_fused(QTensor(values=c, scale=x_q.scale), p1, p2, p3, 0.05, 0.06, 0.07)
        return chain_via_scalar(c, out.values)
    best = {}
    for _ in range(2):
        for name, step in (("classic", step_c), ("fused", step_f)):
            t = chained_device_time(step, x_q.values, lo=20, hi=220)
            best[name] = min(best.get(name, 1e9), t)
    print(f"b{batch}: classic {best['classic']*1e6:7.1f} us   fused "
          f"{best['fused']*1e6:7.1f} us   ratio {best['classic']/best['fused']:.2f}x")
