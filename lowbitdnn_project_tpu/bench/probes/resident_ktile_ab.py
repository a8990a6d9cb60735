"""Batch-1 serving A/B: use-order DMA-streamed stage kernels (the K-tiled
weight-streaming lever, round-3 TODO) vs the grid-prologue stage kernels.

The r3 floor decomposition left l4 at 16.9 us against a ~15 us
load+compute serialization floor: the grid stage kernel's step-0 prologue
loads block 0's whole 4.4 MB weight set before any compute.
kernels/resident_stream.py:stage_nhwc_resident_stream starts every
block's three matrices as async copies in USE ORDER, so compute begins
after just w1[0] (1 MB) and the rest stream behind the matmuls. This
probe is the routing verdict: interleaved min-of-2 over four lanes —
baseline resident (streamed ds, the shipped r4 config), + streamed
stages, classic chain, and classic+both-streams — plus on-device
bit-identity of the streamed-stage logits.

Run: python -m lowbitdnn_project_tpu.bench.probes.resident_ktile_ab [batch]
Writes resident_ktile_ab_r5.json.
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
    apply_serving_resident, mark_stage_stream, mark_stream, merge_pack,
    pack_resident_chain, split_pack)
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
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    # shipped r4 config: ds streams on, stages grid
    arrs_ds, st_ds = split_pack(mark_stream(
        pack_resident_chain(qp8, scales, CFG)))
    # + streamed stages (the candidate)
    arrs_ks, st_ks = split_pack(mark_stage_stream(mark_stream(
        pack_resident_chain(qp8, scales, CFG))))
    # streamed stages only (isolates the stage lever from the ds one)
    arrs_so, st_so = split_pack(mark_stage_stream(
        pack_resident_chain(qp8, scales, CFG)))
    mark("built + packed")

    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

    def mk_step(arrs, st):
        def step(c, qp, s, a):
            out = apply_serving_resident(qp, c, s, CFG, merge_pack(a, st))
            return chain_via_scalar(c, out)
        return step, arrs

    def step_classic(c, qp, s, a):
        out = resnet.apply_quantized_int8chain(qp, c, s, CFG, backend="xla")
        return chain_via_scalar(c, out)

    # on-device bit-identity before timing
    l_ds = jax.jit(lambda a: apply_serving_resident(
        qp8, x, scales, CFG, merge_pack(a, st_ds)))(arrs_ds)
    l_ks = jax.jit(lambda a: apply_serving_resident(
        qp8, x, scales, CFG, merge_pack(a, st_ks)))(arrs_ks)
    identical = bool(jnp.array_equal(l_ds, l_ks))
    mark(f"streamed-stage logits bit-identical on device: {identical}")

    s_ds, _ = mk_step(arrs_ds, st_ds)
    s_ks, _ = mk_step(arrs_ks, st_ks)
    s_so, _ = mk_step(arrs_so, st_so)
    variants = {"classic": (step_classic, arrs_ds),
                "resident_dsstream": (s_ds, arrs_ds),
                "resident_stagestream": (s_so, arrs_so),
                "resident_bothstream": (s_ks, arrs_ks)}
    best = {}
    for p in range(2):
        for name, (fn, a) in variants.items():
            t = chained_device_time(fn, x, lo=200, hi=1500, reps=3,
                                    args=(qp8, scales, a))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    out = {"batch": batch, "us": us,
           "bit_identical": identical,
           "bothstream_vs_dsstream": round(
               us["resident_dsstream"] / us["resident_bothstream"], 3),
           "best": min(us, key=us.get),
           "best_vs_classic": round(us["classic"] / min(us.values()), 3)}
    print(json.dumps(out, indent=1))
    with open("resident_ktile_ab_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
