"""Batch-1 serving decomposition: WHERE do 272 us go?

Round-2 finding: ResNet-50 int8 at batch 1 measures ~272 us vs a ~31 us
weight-HBM floor (25.5 MB / 819 GB/s) and ~20 us compute floor — ~9x
headroom with no breakdown. This probe produces the breakdown IN-CHAIN
(standalone per-layer probes mis-rank on this stack — four confirmed
cases, CLAUDE.md):

  * prefix times T(stop_after_stage=k), k=0..4, plus the full chain:
    stage cost = T(k) - T(k-1); head = T(full) - T(4)
  * A/B of candidate b1 attacks in the same interleaved-min protocol:
      - block_backend="flat" (fused residual blocks; loses at b128 but the
        fusion-neighborhood rule may invert at b1)
      - stem classic vs fused
      - add_domain int8 vs float

Run: python -m lowbitdnn_project_tpu.bench.probes.serving_bisect [batch]
Writes bench/probes artifacts JSON to stdout + serving_bisect_r3.json.
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


def main(batch=1):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    @jax.jit
    def build():
        params = resnet.init_params(jax.random.key(0), CFG)
        return resnet.quantize_params(params, CFG, bits=8)

    qp8 = build()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    mark("built")

    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

    def variant(stop=None, block_backend="none", stem="auto",
                add_domain="float"):
        def step(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla", stem_backend=stem,
                block_backend=block_backend, add_domain=add_domain,
                stop_after_stage=stop)
            if hasattr(out, "values"):
                out = out.values
            return chain_via_scalar(c, out)
        return step

    variants = {
        "full": variant(),
        "stop0_stem": variant(stop=0),
        "stop1": variant(stop=1),
        "stop2": variant(stop=2),
        "stop3": variant(stop=3),
        "stop4": variant(stop=4),
        "full_flatblocks": variant(block_backend="flat"),
        "full_stemclassic": variant(stem="classic"),
        "full_addint8": variant(add_domain="int8"),
    }

    best = {}
    for p in range(2):
        for name, step in variants.items():
            t = chained_device_time(step, x, lo=20, hi=220, reps=3,
                                    args=(qp8, scales))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    stages = {
        "stem": us["stop0_stem"],
        "layer1": round(us["stop1"] - us["stop0_stem"], 1),
        "layer2": round(us["stop2"] - us["stop1"], 1),
        "layer3": round(us["stop3"] - us["stop2"], 1),
        "layer4": round(us["stop4"] - us["stop3"], 1),
        "head": round(us["full"] - us["stop4"], 1),
    }
    out = {"batch": batch, "prefix_us": us, "stage_us": stages}
    print(json.dumps(out, indent=1))
    with open("serving_bisect_r3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
