"""e2e A/B: ResNet-50 int8 chain b128, classic vs fused stem backend."""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.utils.timing import (
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
t0 = time.perf_counter()


def mark(m):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", flush=True)


@jax.jit
def build():
    params = resnet.init_params(jax.random.key(0), CFG)
    return resnet.quantize_params(params, CFG, bits=8)

qp8 = build()
import os
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "..", "bench_cache.json")
with open(_CACHE) as f:
    act_scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
mark("params ready")

import numpy as _np
x = jnp.asarray(_np.random.default_rng(0).normal(size=(B, 224, 224, 3)).astype(_np.float32))
variants = ["classic", "s2d8", "fused"]
best = {}
for _pass in range(3):
    for name in variants:
        def step(c, qp, scales, name=name):
            logits = resnet.apply_quantized_int8chain(
                qp, c, scales, CFG, backend="xla", stem_backend=name)
            return chain_via_scalar(c, logits)

        t = chained_device_time(step, x, lo=20, hi=220, reps=3,
                                args=(qp8, act_scales))
        best[name] = min(best.get(name, t), t)
        mark(f"b{B} stem={name} pass{_pass}: {t*1e6:.1f} us"
             f" ({B/t:.0f} img/s)")

print("---- min of passes ----")
for name in variants:
    print(f"{name}: {best[name]*1e6:.1f} us  {B/best[name]:.0f} img/s")
print(f"fused/classic speedup: {best['classic']/best['fused']:.4f}")
