"""The full torchvision-ResNet family, one artifact: int8 vs bf16 at b32.

R50 has the flagship treatment and R101/152 got deep_zoo_r5.json; this
completes the family with R18/R34 measured under the identical protocol
(interleaved passes, per-variant best, chained device timing) so a user
can read one table across all five depths. Basic-block models (18/34)
have no 1×1 bottlenecks — their compute is almost all the high-SOL 3×3
body class, so the int8 ratio should sit near the dense-shape median.

Run: python -m lowbitdnn_project_tpu.bench.probes.family_zoo_bench
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
MODELS = [("resnet18", resnet.RESNET18, 25, 275),
          ("resnet34", resnet.RESNET34, 15, 165),
          ("resnet50", resnet.RESNET50, 10, 110)]


def main():
    t0 = time.perf_counter()
    built = {}
    for name, cfg, lo, hi in MODELS:

        @jax.jit
        def build(cfg=cfg):
            params = resnet.init_params(jax.random.key(0), cfg)
            qparams = resnet.quantize_params(params, cfg)
            x = jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3),
                                  jnp.float32)
            return params, qparams, x

        params, qparams, x = build()
        act_scales = resnet.calibrate_act_scales(params, [x[:8]], cfg)
        params_bf16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        built[name] = (cfg, qparams, x, act_scales, params_bf16, lo, hi)
        print(f"[+{time.perf_counter()-t0:6.1f}s] {name} built", flush=True)

    best = {}
    for _pass in range(2):
        for name, *_ in MODELS:
            cfg, qparams, x, act_scales, params_bf16, lo, hi = built[name]

            def int8_step(c, qp, scales, cfg=cfg):
                return chain_via_scalar(c, resnet.apply_quantized_int8chain(
                    qp, c, scales, cfg, backend="xla"))

            def bf16_step(c, p, cfg=cfg):
                return chain_via_scalar(c, resnet.apply_fp32(p, c, cfg))

            for key, step, init, args in (
                    ("int8", int8_step, x, (qparams, act_scales)),
                    ("bf16", bf16_step, x.astype(jnp.bfloat16),
                     (params_bf16,))):
                t = chained_device_time(step, init, lo=lo, hi=hi, reps=3,
                                        args=args)
                k = f"{name}_{key}"
                best[k] = max(best.get(k, 0.0), BATCH / t)
                print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} {k}: "
                      f"{BATCH/t:.0f} img/s", flush=True)

    rows = [{"model": n, "batch": BATCH,
             "int8_img_s": round(best[f"{n}_int8"], 0),
             "bf16_img_s": round(best[f"{n}_bf16"], 0),
             "int8_vs_bf16": round(best[f"{n}_int8"] / best[f"{n}_bf16"], 3)}
            for n, *_ in MODELS]
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    with open(os.path.join(root, "family_zoo_r5.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(rows)


if __name__ == "__main__":
    main()
