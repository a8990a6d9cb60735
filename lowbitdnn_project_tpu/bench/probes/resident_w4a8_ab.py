"""Batch-1 serving A/B: int8 resident chain vs the W4A8 resident chain
(nibble-packed weights streamed into the layer3/4 + ds kernels).

Round-3 floor decomposition said the deep stages sit AT their
weight-streaming floors (l4 stage 16.9 us ~ its 8.8 MB stream floor, ds4
15.4 us with a 5.75 MB one-shot load); kernels/resident_w4a8.py halves
those bytes. This probe is the verdict: interleaved min-of-2, chained
device timing, classic chain as the common denominator, plus on-device
logit agreement of the w4 chain vs the classic chain running the same
mixed-precision params.

Run: python -m lowbitdnn_project_tpu.bench.probes.resident_w4a8_ab [batch]
Writes resident_w4a8_ab_r4.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                       # noqa: E402
from lowbitdnn_project_tpu.kernels.resident_chain import (            # noqa: E402
    apply_serving_resident, mark_stream, pack_resident_chain, split_pack,
    merge_pack)
from lowbitdnn_project_tpu.kernels.resident_w4a8 import (             # noqa: E402
    apply_serving_resident_w4, merge_pack_w4, mixed_w4_qparams,
    pack_resident_chain_w4, split_pack_w4)
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def main(batch=1):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    params = resnet.init_params(jax.random.key(0), CFG)
    qp8 = jax.jit(lambda: resnet.quantize_params(params, CFG, bits=8))()
    qpm = jax.jit(lambda: mixed_w4_qparams(params, CFG))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    arrs8, st8 = split_pack(pack_resident_chain(qp8, scales, CFG))
    arrs4, st4 = split_pack_w4(pack_resident_chain_w4(qpm, scales, CFG))
    arrs8s, st8s = split_pack(mark_stream(
        pack_resident_chain(qp8, scales, CFG)))
    arrs4s, st4s = split_pack_w4(mark_stream(
        pack_resident_chain_w4(qpm, scales, CFG)))
    mark("built + packed")

    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

    def step_classic(c, qp, s, a, a4):
        out = resnet.apply_quantized_int8chain(qp, c, s, CFG, backend="xla")
        return chain_via_scalar(c, out)

    def step_res8(c, qp, s, a, a4):
        out = apply_serving_resident(qp, c, s, CFG, merge_pack(a, st8))
        return chain_via_scalar(c, out)

    def step_res4(c, qp, s, a, a4):
        out = apply_serving_resident_w4(qpm, c, s, CFG,
                                        merge_pack_w4(a4, st4))
        return chain_via_scalar(c, out)

    def step_res8_stream(c, qp, s, a, a4):
        out = apply_serving_resident(qp, c, s, CFG,
                                     merge_pack(arrs8s, st8s))
        return chain_via_scalar(c, out)

    def step_res4_stream(c, qp, s, a, a4):
        out = apply_serving_resident_w4(qpm, c, s, CFG,
                                        merge_pack_w4(arrs4s, st4s))
        return chain_via_scalar(c, out)

    # correctness cross-checks on device before timing
    l8 = jax.jit(lambda a: apply_serving_resident(
        qp8, x, scales, CFG, merge_pack(a, st8)))(arrs8)
    l4 = jax.jit(lambda a4: apply_serving_resident_w4(
        qpm, x, scales, CFG, merge_pack_w4(a4, st4)))(arrs4)
    lc4 = jax.jit(lambda: resnet.apply_quantized_int8chain(
        qpm, x, scales, CFG, backend="xla"))()
    agree_w4 = bool((jnp.argmax(l4, -1) == jnp.argmax(lc4, -1)).all())
    rel_w4 = float(jnp.linalg.norm(l4 - lc4) / jnp.linalg.norm(lc4))
    rel_48 = float(jnp.linalg.norm(l4 - l8) / jnp.linalg.norm(l8))
    mark(f"device logits: w4-vs-classic(mixed) agree {agree_w4} "
         f"rel {rel_w4:.4f}; w4-vs-int8-chain rel {rel_48:.4f}")

    variants = {"classic": step_classic, "resident_int8": step_res8,
                "resident_w4a8": step_res4,
                "resident_int8_stream": step_res8_stream,
                "resident_w4a8_stream": step_res4_stream}
    best = {}
    for p in range(2):
        for name, fn in variants.items():
            t = chained_device_time(fn, x, lo=200, hi=1500, reps=3,
                                    args=(qp8, scales, arrs8, arrs4))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    out = {"batch": batch, "us": us,
           "w4_argmax_agree_vs_classic_mixed": agree_w4,
           "w4_logit_rel_vs_classic_mixed": round(rel_w4, 4),
           "w4_logit_rel_vs_resident_int8": round(rel_48, 4),
           "w4_vs_int8_resident": round(
               us["resident_int8"] / us["resident_w4a8"], 3),
           "w4_vs_classic": round(us["classic"] / us["resident_w4a8"], 3),
           "best": min(us, key=us.get),
           "best_vs_classic": round(us["classic"] / min(us.values()), 3)}
    print(json.dumps(out, indent=1))
    name = ("resident_w4a8_ab_r4.json" if batch == 1
            else f"resident_w4a8_ab_b{batch}_r4.json")
    with open(name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
