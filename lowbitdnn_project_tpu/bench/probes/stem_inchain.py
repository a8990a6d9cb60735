"""Pin the IN-CHAIN cost of the classic stem by measurement (VERDICT r4).

The r4 ceiling table argued the classic stem's in-chain effective cost at
b128 is ~350 us (vs 568 us standalone) from fusion-neighborhood bisection
— an inference, not an artifact. This probe measures it directly as a
difference of two chained e2e timings that share every op except the stem:

  full_classic = stem(classic)+pool -> stages -> head      (whole chain)
  rest         = stages -> head  (skip_stem=True, carry = the int8
                 post-stem feature map; models/resnet.py's pipeline hook)
  in-chain stem cost = full_classic - rest

plus standalone chain-to-stage-0 (stop_after_stage=0) and the fused-stem
full chain for the routing context. Chained device timing, interleaved
min-of-2 passes.

Run: python -m lowbitdnn_project_tpu.bench.probes.stem_inchain [batches...]
Writes stem_inchain_r5.json.
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
from lowbitdnn_project_tpu.quant.qtensor import QTensor               # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def main(batches=(32, 128)):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    params = resnet.init_params(jax.random.key(0), CFG)
    qp8 = jax.jit(lambda: resnet.quantize_params(params, CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    mark("built")

    results = []
    for batch in batches:
        x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5
        # the int8 post-stem feature map (the rest-chain carry)
        feat = jax.jit(lambda: resnet.apply_quantized_int8chain(
            qp8, x, scales, CFG, backend="xla", stem_backend="classic",
            stop_after_stage=0))()
        fvals = feat.values
        s1 = jnp.asarray(feat.scale, jnp.float32)
        mark(f"b{batch} stem-out feature map {fvals.shape}")

        def step_full_classic(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla", stem_backend="classic")
            return chain_via_scalar(c, out)

        def step_full_fused(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla", stem_backend="fused")
            return chain_via_scalar(c, out)

        def step_rest(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, QTensor(values=c, scale=s1), s, CFG, backend="xla",
                skip_stem=True)
            return chain_via_scalar(c, out)

        def step_stem_only(c, qp, s):
            out = resnet.apply_quantized_int8chain(
                qp, c, s, CFG, backend="xla", stem_backend="classic",
                stop_after_stage=0)
            return chain_via_scalar(c, out.values)

        lo, hi = (30, 330) if batch <= 32 else (10, 110)
        variants = [("full_classic", step_full_classic, x),
                    ("full_fused", step_full_fused, x),
                    ("rest_skip_stem", step_rest, fvals),
                    ("stem_standalone", step_stem_only, x)]
        best = {}
        for p in range(2):
            for name, fn, init in variants:
                t = chained_device_time(fn, init, lo=lo, hi=hi, reps=3,
                                        args=(qp8, scales))
                best[name] = min(best.get(name, t), t)
                mark(f"b{batch} {name} pass{p}: {t * 1e6:8.1f} us")

        us = {k: round(v * 1e6, 1) for k, v in best.items()}
        row = {"batch": batch, "us": us,
               "stem_inchain_us": round(
                   us["full_classic"] - us["rest_skip_stem"], 1),
               "stem_standalone_us": us["stem_standalone"],
               "fused_vs_classic_full": round(
                   us["full_classic"] / us["full_fused"], 3)}
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open("stem_inchain_r5.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (32, 128))
