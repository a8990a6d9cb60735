"""e2e A/B: chain with stem v2 vs v3, interleaved min-of-2."""
import sys, json, os
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

cfg = resnet.RESNET50
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
@jax.jit
def build():
    return resnet.quantize_params(resnet.init_params(jax.random.key(0), cfg), cfg)
qp = build()
with open("/root/repo/bench_cache.json") as f:
    scales = {k: jnp.asarray(v, jnp.float32) for k, v in json.load(f)["act_scales"].items()}
x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3))

def mk(sb):
    def step(c, qp_, sc_):
        return chain_via_scalar(c, resnet.apply_quantized_int8chain(
            qp_, c, sc_, cfg, stem_backend=sb))
    return step

best = {}
for _ in range(2):
    for sb in ("fused2", "fused3"):
        t = chained_device_time(mk(sb), x, lo=20, hi=220, args=(qp, scales))
        best[sb] = min(best.get(sb, 1e9), t)
for sb, t in best.items():
    print(f"b{batch} {sb}: {t*1e6:8.1f} us  {batch/t:8.0f} img/s")
