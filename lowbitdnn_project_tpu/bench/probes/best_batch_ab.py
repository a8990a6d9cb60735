"""Interleaved throughput A/B across batch sizes (each with its best stem).

Compares images/s of the int8 chain at several batches in one process,
alternating variants per pass so relay clock drift cancels.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.utils.timing import (
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50
t0 = time.perf_counter()


@jax.jit
def build():
    params = resnet.init_params(jax.random.key(0), CFG)
    return resnet.quantize_params(params, CFG)

qp8 = build()
import os
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "..", "bench_cache.json")
with open(_CACHE) as f:
    act_scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}

rng = np.random.default_rng(0)
CONFIGS = [(32, "fused"), (64, "fused"), (128, "classic"),
           (256, "classic")]
xs = {b: jnp.asarray(rng.normal(size=(b, 224, 224, 3)).astype(np.float32))
      for b, _ in CONFIGS}

best = {}
for _pass in range(3):
    for b, stem in CONFIGS:
        def step(c, qp, scales, stem=stem):
            logits = resnet.apply_quantized_int8chain(
                qp, c, scales, CFG, backend="xla", stem_backend=stem)
            return chain_via_scalar(c, logits)

        # scale iteration counts to keep the timed delta >= ~100 ms
        hi = max(25, int(round(220 * 32 / b)))
        lo = max(3, hi // 11)
        t = chained_device_time(step, xs[b], lo=lo, hi=hi, reps=3,
                                args=(qp8, act_scales))
        key = f"b{b}_{stem}"
        best[key] = max(best.get(key, 0.0), b / t)
        print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} {key}: "
              f"{t*1e6:.1f} us = {b/t:.0f} img/s", flush=True)

print("---- best img/s ----")
for k, v in best.items():
    print(f"{k}: {v:.0f}")
