"""ResNet-101/152 e2e throughput: int8 chain vs bf16 at the headline batch.

Extends the flagship RN50 evidence down the torchvision depth family —
deeper members shift compute toward the high-SOL 3x3/1x1 body classes
(stem and head amortize), so the int8-vs-bf16 ratio should hold or improve
with depth. Interleaved passes (variants alternate per pass, per-variant
best) cancel relay clock drift.

Run: python -m lowbitdnn_project_tpu.bench.probes.deep_zoo_bench
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

BATCH = 32


def main():
    t0 = time.perf_counter()
    results = []
    for name, cfg in (("resnet101", resnet.RESNET101),
                      ("resnet152", resnet.RESNET152)):

        @jax.jit
        def build(cfg=cfg):
            params = resnet.init_params(jax.random.key(0), cfg)
            qparams = resnet.quantize_params(params, cfg)
            x = jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3),
                                  jnp.float32)
            return params, qparams, x

        params, qparams, x = build()
        act_scales = resnet.calibrate_act_scales(params, [x[:8]], cfg)
        print(f"[+{time.perf_counter()-t0:6.1f}s] {name} built+calibrated",
              flush=True)

        params_bf16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        xb = x.astype(jnp.bfloat16)

        def int8_step(c, qp, scales, cfg=cfg):
            return chain_via_scalar(c, resnet.apply_quantized_int8chain(
                qp, c, scales, cfg, backend="xla"))

        def bf16_step(c, p, cfg=cfg):
            return chain_via_scalar(c, resnet.apply_fp32(p, c, cfg))

        best = {"int8": 0.0, "bf16": 0.0}
        for _pass in range(2):
            for key, step, init, args in (
                    ("int8", int8_step, x, (qparams, act_scales)),
                    ("bf16", bf16_step, xb, (params_bf16,))):
                t = chained_device_time(step, init, lo=10, hi=60, reps=3,
                                        args=args)
                best[key] = max(best[key], BATCH / t)
                print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} "
                      f"{name} {key}: {t*1e6:.1f} us = {BATCH/t:.0f} img/s",
                      flush=True)
        results.append({
            "model": name, "batch": BATCH,
            "int8_img_s": round(best["int8"], 0),
            "bf16_img_s": round(best["bf16"], 0),
            "int8_vs_bf16": round(best["int8"] / best["bf16"], 3),
        })

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    with open(os.path.join(root, "deep_zoo_r5.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(results)


if __name__ == "__main__":
    main()
