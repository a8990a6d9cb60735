"""e2e throughput batch scan for the headline config (INT8 chain,
float-domain adds): find the images/s-optimal batch on one chip.

Round-1 only scanned the int8-adds variant (best 128); the shipped default
is float-adds — this scans it directly.

Run: python -m lowbitdnn_project_tpu.bench.batch_scan [batches...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                     # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                    # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "bench_cache.json")


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 96, 128, 192, 256]
    t0 = time.perf_counter()

    @jax.jit
    def build():
        params = resnet.init_params(jax.random.key(0), CFG)
        return resnet.quantize_params(params, CFG)

    qparams = build()
    with open(_CACHE) as f:
        act_scales = {k: jnp.asarray(v, jnp.float32)
                      for k, v in json.load(f)["act_scales"].items()}
    print(f"[+{time.perf_counter() - t0:.1f}s] built", file=sys.stderr,
          flush=True)

    rows = []
    for b in batches:
        x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.5

        def step(c, qparams, act_scales):
            logits = resnet.apply_quantized_int8chain(
                qparams, c, act_scales, CFG, backend="xla")
            return chain_via_scalar(c, logits)

        t = chained_device_time(step, x, lo=5, hi=55, reps=3,
                                args=(qparams, act_scales))
        rows.append({"batch": b, "ms": round(t * 1e3, 3),
                     "img_s": round(b / t, 0)})
        print(rows[-1], flush=True)
    with open("batch_scan_r2.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
