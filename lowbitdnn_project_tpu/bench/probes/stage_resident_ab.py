"""Batch-1 serving A/B: VMEM-resident stage kernel vs the per-conv chain.

serving_bisect_r3.json closed the b1 gap at 110.8 us with a per-op-overhead
ceiling argument: layers 1-3 hold 42 convs + 13 block tails at ~1.6-2.3 us
of fixed cost each against <10 us of combined compute/weight floors.  The
stage-resident kernel (kernels/stage_resident.py) attacks exactly that —
ONE dispatch per stage's identity-block run, activations VMEM-resident
across blocks — so this probe decides whether the five-times-measured
"e2e A/B only" routing rule finally inverts in the regime where XLA's
per-op fixed cost dominates its compute.

Protocol: interleaved min-of-2 passes (relay clock drifts >10%/min),
chained device timing.  Variants:
  * full          — block_backend="none" (the shipped 110.8 us config)
  * resident_l234 — stages 2+3+4 identity runs fused (layer1 cmid=64
                    stays per-conv)
  * resident_l23  — stages 2+3 only (layer4 streams 4.4 MB weights/block;
                    isolate whether its VMEM pressure pays)

Run: python -m lowbitdnn_project_tpu.bench.probes.stage_resident_ab [batch]
Writes stage_resident_ab_r3.json.
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
from lowbitdnn_project_tpu.kernels.stage_resident import (           # noqa: E402
    pack_stage_resident)
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
    packs_l234 = pack_stage_resident(qp8, scales, CFG, stages=(1, 2, 3))
    packs_l23 = {k: packs_l234[k] for k in (1, 2)}
    mark(f"built; packs for stages {sorted(packs_l234)}")

    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

    def variant(packs=None):
        def step(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla",
                block_backend="resident" if packs else "none",
                stage_packs=packs)
            return chain_via_scalar(c, out)
        return step

    variants = {
        "full": variant(),
        "resident_l234": variant(packs_l234),
        "resident_l23": variant(packs_l23),
        "resident_l2": variant({1: packs_l234[1]}),
        "resident_l3": variant({2: packs_l234[2]}),
        "resident_l4": variant({3: packs_l234[3]}),
    }

    best = {}
    for p in range(2):
        for name, step in variants.items():
            t = chained_device_time(step, x, lo=20, hi=220, reps=3,
                                    args=(qp8, scales))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    out = {"batch": batch, "us": us,
           "speedup_l234": round(us["full"] / us["resident_l234"], 3),
           "speedup_l23": round(us["full"] / us["resident_l23"], 3)}
    print(json.dumps(out, indent=1))
    with open("stage_resident_ab_r3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
