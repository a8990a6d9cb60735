"""In-chain stage cost bisection at b32: time prefixes (stem, +l1, ..) of
the flagship config and difference adjacent prefixes. Interleaved passes,
per-variant min (relay drift)."""
import sys
import json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

cfg = resnet.RESNET50
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
stem = sys.argv[2] if len(sys.argv) > 2 else "fused"

@jax.jit
def build():
    params = resnet.init_params(jax.random.key(0), cfg)
    return resnet.quantize_params(params, cfg)
qp = build()
import os
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "..", "bench_cache.json")
with open(_CACHE) as f:
    scales = {k: jnp.asarray(v, jnp.float32)
              for k, v in json.load(f)["act_scales"].items()}
x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3))

def mkstep(stage):
    # params/scales ride through args= (NOT the closure): closed-over
    # pytrees become XLA constants and a ResNet-50-sized executable takes
    # minutes to push through the KB/s relay (utils/timing.py docstring)
    def step(carry, qp_, sc_):
        out = resnet.apply_quantized_int8chain(
            qp_, carry, sc_, cfg, stem_backend=stem,
            stop_after_stage=stage)
        v = out.values if hasattr(out, "values") else out
        return chain_via_scalar(carry, v)
    return step

stages = [0, 1, 2, 3, 4, None]
best = {}
for _ in range(2):
    for st in stages:
        t = chained_device_time(mkstep(st), x, lo=20, hi=220,
                                args=(qp, scales))
        key = "full" if st is None else f"s{st}"
        best[key] = min(best.get(key, 1e9), t)
prev = 0.0
for st in stages:
    key = "full" if st is None else f"s{st}"
    t = best[key]
    print(f"b{batch}/{stem} prefix {key:5s}: {t*1e6:8.1f} us  "
          f"(delta {1e6*(t-prev):7.1f} us)")
    prev = t
