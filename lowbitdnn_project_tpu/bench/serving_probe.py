"""Serving-latency table: INT8 vs W4A8 ResNet-50 at batch 1-8.

Round-3 note: the round-2 artifact (serving_latency_r2.json, b1 271.7 us)
predates the fused-stem routing — the XLA C=3 stem emitter costs ~120 us
at batch 1 and kernels/stem_fused.py removes almost all of it (in-chain
stem: 5.7 us, bench/probes/serving_bisect.py). The r3 table reflects the
shipped chain; see serving_bisect_r3.json for the stage decomposition.

The W4A8 config carries int4 weights everywhere and runs them through the
same fused XLA int8 chain (int4 values stored in int8 lanes) — measured at
parity with the INT8 config at every batch. The third column is the
opt-in Pallas-routed variant (nibble-packed cin>=256 1x1 layers through
the W4A8 kernel, use_w4a8_1x1=True): kept as the measured NEGATIVE result
— each in-chain Pallas insertion costs ~30 us at batch 1, so the routing
defaults off (models/resnet.py apply_quantized_int8chain).

Run: python -m lowbitdnn_project_tpu.bench.serving_probe
Writes serving_latency_r4.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                      # noqa: E402
from lowbitdnn_project_tpu.models.layers import prepack_w4a8_1x1     # noqa: E402
from lowbitdnn_project_tpu.kernels.resident_chain import (           # noqa: E402
    apply_serving_resident, mark_stream, merge_pack, pack_resident_chain,
    split_pack)
from lowbitdnn_project_tpu.utils.timing import (                     # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "bench_cache.json")


def main():
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    @jax.jit
    def build():
        params = resnet.init_params(jax.random.key(0), CFG)
        qp8 = resnet.quantize_params(params, CFG, bits=8)
        qp4 = resnet.quantize_params(params, CFG, bits=4)
        return qp8, qp4

    qp8, qp4 = build()
    mark("params built")
    qp4 = jax.jit(lambda p: prepack_w4a8_1x1(p, min_cin=256))(qp4)
    jax.block_until_ready(jax.tree_util.tree_leaves(qp4)[0])
    mark("w4 packed")

    with open(_CACHE) as f:
        act_scales = {k: jnp.asarray(v, jnp.float32)
                      for k, v in json.load(f)["act_scales"].items()}
    mark("scales loaded")

    # DMA-streamed ds weights won the r4 A/B (99.4 vs 103.0 plain resident
    # vs 117.5 classic, resident_w4a8_ab_r4.json) — stream by default
    arrs, statics = split_pack(
        mark_stream(pack_resident_chain(qp8, act_scales, CFG)))
    mark("resident pack built")

    rows = []
    for b in (1, 4, 8):
        x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.5
        res = {"batch": b}
        variants = [("int8", qp8, False), ("w4a8", qp4, False),
                    ("w4a8_routed", qp4, True)]
        if b == 1:
            # the contiguous resident pallas chain (resident_chain_ab_r3):
            # batch-1 only — its whole-map VMEM residency does not hold at
            # larger batches (layer1 acc buffers exceed VMEM at b>=4)
            variants.append(("resident", qp8, None))
        best = {}
        # two interleaved passes: the relay clock drifts over a run, so
        # back-to-back per-variant timing mis-ranks identical graphs by
        # >10%; alternating and taking the per-variant min cancels drift
        for _pass in range(2):
            for name, qp, routed in variants:
                if routed is None:
                    def step(c, qp, scales, a):
                        logits = apply_serving_resident(
                            qp, c, scales, CFG, merge_pack(a, statics))
                        return chain_via_scalar(c, logits)
                    args = (qp, act_scales, arrs)
                else:
                    def step(c, qp, scales, routed=routed):
                        logits = resnet.apply_quantized_int8chain(
                            qp, c, scales, CFG, backend="xla",
                            use_w4a8_1x1=routed)
                        return chain_via_scalar(c, logits)
                    args = (qp, act_scales)

                # iteration floors per CLAUDE.md: deltas must clear the
                # ~100 ms relay-jitter floor (~100-460 us steps -> hi>=1200)
                lo, hi = (200, 1500) if b == 1 else (150, 1200)
                t = chained_device_time(step, x, lo=lo, hi=hi, reps=3,
                                        args=args)
                best[name] = min(best.get(name, t), t)
                mark(f"b{b} {name} pass{_pass}: {t * 1e6:.1f}us")
        for name, _, _ in variants:
            res[f"{name}_us"] = round(best[name] * 1e6, 1)
            res[f"{name}_img_s"] = round(b / best[name], 0)
        res["w4a8_vs_int8"] = round(res["int8_us"] / res["w4a8_us"], 3)
        if "resident_us" in res:
            res["resident_vs_int8"] = round(
                res["int8_us"] / res["resident_us"], 3)
        rows.append(res)
        print(res, flush=True)

    with open("serving_latency_r4.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
