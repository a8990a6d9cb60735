"""e2e A/B: folded-W layer1 (XLA-level) vs classic, flagship batches.

Layer1 is the flagship's measured lane-starvation ceiling: cmid=64
half-fills the MXU lane dims, 26% of nominal peak at b128, with two fused
Pallas generations disproving a kernel win (KERNEL_LAB).  The resident
chain's fold_block_weights algebra offers an XLA-level reformulation: fold
W-pairs into channels (one reshape in, one out), run every layer1 conv at
full 128+ lanes with lane-routed weights, for 2x padded MACs.  If starved
utilization is < 50%, the fold nets positive — IF the fusion-neighborhood
rule doesn't eat it (xla_gemm, mis-rank #5, lost e2e the same way).

Interleaved min-of-2, chained device timing, flagship config (fused stem,
auto-routing) at b32 and b128.

Run: python -m lowbitdnn_project_tpu.bench.probes.fold_l1_ab
Writes fold_l1_ab_r3.json.
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


def main():
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    qp8 = jax.jit(lambda: resnet.quantize_params(
        resnet.init_params(jax.random.key(0), CFG), CFG, bits=8))()
    qpf = resnet.fold_layer1_params(qp8, CFG)
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    mark("built + folded")

    results = {}
    for b in (32, 128):
        x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.5

        def step(c, qp, s, folded):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla", fold_layer1=folded)
            return chain_via_scalar(c, out)

        best = {}
        for p in range(2):
            for name, qp, folded in (("classic", qp8, False),
                                     ("fold_l1", qpf, True)):
                t = chained_device_time(
                    lambda c, qp, s, f=folded: step(c, qp, s, f),
                    x, lo=20, hi=220, reps=3, args=(qp, scales))
                best[name] = min(best.get(name, t), t)
                mark(f"b{b} {name} pass{p}: {t * 1e6:9.1f} us")
        results[f"b{b}"] = {
            "classic_us": round(best["classic"] * 1e6, 1),
            "fold_l1_us": round(best["fold_l1"] * 1e6, 1),
            "classic_img_s": round(b / best["classic"], 0),
            "fold_l1_img_s": round(b / best["fold_l1"], 0),
            "speedup": round(best["classic"] / best["fold_l1"], 3),
        }
        print(results[f"b{b}"], flush=True)

    with open("fold_l1_ab_r3.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
