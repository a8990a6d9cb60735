"""Deep-family serving at micro-batches 4/8 (shipped int8 chain).

Completes deep_serving_r5.json (b1) with the b4/b8 rows of the RN50
serving table, RN50 interleaved as the drift anchor. The b≥2 router lane
is the classic XLA chain (fused stem routes ≤b64; resident kernels are
b1/RN50-only).

Run: python -m lowbitdnn_project_tpu.bench.probes.deep_serving_batches
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

MODELS = [("resnet50", resnet.RESNET50),
          ("resnet101", resnet.RESNET101),
          ("resnet152", resnet.RESNET152)]
BATCHES = (4, 8)
# iteration counts sized per op magnitude (delta >= ~100 ms, CLAUDE.md)
ITERS = {("resnet50", 4): (60, 660), ("resnet50", 8): (40, 440),
         ("resnet101", 4): (40, 440), ("resnet101", 8): (25, 275),
         ("resnet152", 4): (30, 330), ("resnet152", 8): (18, 198)}


def main():
    t0 = time.perf_counter()
    built = {}
    for name, cfg in MODELS:

        @jax.jit
        def build(cfg=cfg):
            params = resnet.init_params(jax.random.key(0), cfg)
            qparams = resnet.quantize_params(params, cfg)
            x = jax.random.normal(jax.random.key(1), (8, 224, 224, 3),
                                  jnp.float32)
            return params, qparams, x

        params, qparams, x = build()
        act_scales = resnet.calibrate_act_scales(params, [x], cfg)
        built[name] = (cfg, qparams, x, act_scales)
        print(f"[+{time.perf_counter()-t0:6.1f}s] {name} built", flush=True)

    best = {}
    for _pass in range(3):
        for name, _ in MODELS:
            cfg, qparams, x8, act_scales = built[name]
            for b in BATCHES:
                def step(c, qp, scales, cfg=cfg):
                    return chain_via_scalar(
                        c, resnet.apply_quantized_int8chain(
                            qp, c, scales, cfg, backend="xla"))

                lo, hi = ITERS[(name, b)]
                t = chained_device_time(step, x8[:b], lo=lo, hi=hi, reps=3,
                                        args=(qparams, act_scales))
                k = (name, b)
                best[k] = min(best.get(k, 1e9), t * 1e6)
                print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} "
                      f"{name} b{b}: {t*1e6:.1f} us", flush=True)

    rows = [{"model": n, "batch": b, "int8_us": round(best[(n, b)], 1),
             "img_s": round(b / (best[(n, b)] * 1e-6), 0)}
            for n, _ in MODELS for b in BATCHES]
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    with open(os.path.join(root, "deep_serving_batches_r5.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(rows)


if __name__ == "__main__":
    main()
