"""e2e A/B: 1x1 convs as dot_general ("xla_gemm") vs the conv emitter.

The standalone 1x1 ablation (one_by_one_ablate_r3.json) showed dot_general
beating the conv emitter by ~10% on l3.n.c3 (and losing ~14% on l3.n.c1).
Per the probe-vs-e2e mis-rank rule (four confirmed cases), routing is
decided ONLY here: full ResNet-50 int8 chain, backend "xla" vs "xla_gemm",
interleaved min-of-2.

Run: python -m lowbitdnn_project_tpu.bench.probes.gemm1x1_e2e_ab [batches]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                      # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                     # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def main(batches=(32, 128)):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    qp8 = jax.jit(lambda: resnet.quantize_params(
        resnet.init_params(jax.random.key(0), CFG), CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    mark("built")

    rows = []
    for b in batches:
        x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.5

        def make(backend):
            def step(c, qp, s):
                out = resnet.apply_quantized_int8chain(
                    qp, c, s, CFG, backend=backend)
                return chain_via_scalar(c, out)
            return step

        best = {}
        for p in range(2):
            for name in ("xla", "xla_gemm"):
                t = chained_device_time(make(name), x, lo=20, hi=220,
                                        reps=3, args=(qp8, scales))
                best[name] = min(best.get(name, t), t)
                mark(f"b{b} {name} pass{p}: {t * 1e6:9.1f} us")
        row = {"batch": b,
               "xla_us": round(best["xla"] * 1e6, 1),
               "xla_gemm_us": round(best["xla_gemm"] * 1e6, 1),
               "gemm_speedup": round(best["xla"] / best["xla_gemm"], 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("gemm1x1_e2e_ab_r3.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (32, 128))
