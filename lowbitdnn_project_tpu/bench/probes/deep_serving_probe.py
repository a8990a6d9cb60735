"""Batch-1 serving latency for ResNet-101/152 (shipped int8 chain).

The RN50 b1 story is settled (resident streamed chain ~100 µs, 1.17×);
for the deeper family members the resident kernels don't apply (they are
RN50-stage-shaped), so the serving row is the shipped XLA chain (fused stem auto-routed at b1) — the
b≥2 router's lane. Interleaved with the RN50 chain as the in-process drift anchor
(measured 114.2 us here vs the 116-117 classic passes - consistent).

Run: python -m lowbitdnn_project_tpu.bench.probes.deep_serving_probe
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                     # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                    # noqa: E402
    chain_via_scalar, chained_device_time)

MODELS = [("resnet50", resnet.RESNET50, 250, 2750),
          ("resnet101", resnet.RESNET101, 120, 1320),
          ("resnet152", resnet.RESNET152, 90, 990)]


def main():
    t0 = time.perf_counter()
    built = {}
    for name, cfg, lo, hi in MODELS:

        @jax.jit
        def build(cfg=cfg):
            params = resnet.init_params(jax.random.key(0), cfg)
            qparams = resnet.quantize_params(params, cfg)
            x = jax.random.normal(jax.random.key(1), (1, 224, 224, 3),
                                  jnp.float32)
            return params, qparams, x

        params, qparams, x = build()
        act_scales = resnet.calibrate_act_scales(params, [x], cfg)
        built[name] = (cfg, qparams, x, act_scales, lo, hi)
        print(f"[+{time.perf_counter()-t0:6.1f}s] {name} built", flush=True)

    best = {}
    for _pass in range(3):
        for name, cfg, lo, hi in MODELS:
            cfg, qparams, x, act_scales, lo, hi = built[name]

            def step(c, qp, scales, cfg=cfg):
                return chain_via_scalar(c, resnet.apply_quantized_int8chain(
                    qp, c, scales, cfg, backend="xla"))

            t = chained_device_time(step, x, lo=lo, hi=hi, reps=3,
                                    args=(qparams, act_scales))
            best[name] = min(best.get(name, 1e9), t * 1e6)
            print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} {name}: "
                  f"{t*1e6:.1f} us", flush=True)

    rows = [{"model": n, "batch": 1, "int8_us": round(best[n], 1)}
            for n, *_ in MODELS]
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    with open(os.path.join(root, "deep_serving_r5.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(rows)


if __name__ == "__main__":
    main()
