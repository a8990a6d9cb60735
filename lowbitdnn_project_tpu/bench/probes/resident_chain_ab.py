"""Batch-1 serving A/B: the contiguous resident pallas chain vs the
shipped classic config.

Follow-up to pallas_tax_r3.json: the classic chain's 110.8 us is per-op
bound, mid-chain Pallas insertions each pay a ~62 us entry tax, but
pallas->pallas + glue is free — so kernels/resident_chain.py runs
stem -> layer4 as ONE contiguous pallas region.  This probe is the verdict:
interleaved min-of-2, chained device timing, plus a correctness cross-check
of the two variants' logits on device.

Run: python -m lowbitdnn_project_tpu.bench.probes.resident_chain_ab [batch]
Writes resident_chain_ab[_bN]_r3.json (b1 keeps the headline filename).
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
from lowbitdnn_project_tpu.kernels.resident_chain import (           # noqa: E402
    apply_serving_resident, merge_pack, pack_resident_chain, split_pack)
from lowbitdnn_project_tpu.utils.timing import (                     # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50

def main(batch=1):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    qp8 = jax.jit(lambda: resnet.quantize_params(
        resnet.init_params(jax.random.key(0), CFG), CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    arrs, statics = split_pack(pack_resident_chain(qp8, scales, CFG))
    mark("built + packed")

    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

    def step_classic(c, qp, s, a):
        out = resnet.apply_quantized_int8chain(qp, c, s, CFG, backend="xla")
        return chain_via_scalar(c, out)

    def step_resident(c, qp, s, a):
        out = apply_serving_resident(qp, c, s, CFG, merge_pack(a, statics))
        return chain_via_scalar(c, out)

    # correctness cross-check on device before timing
    lc = jax.jit(lambda qp, s, a: resnet.apply_quantized_int8chain(
        qp, x, s, CFG, backend="xla"))(qp8, scales, arrs)
    lr = jax.jit(lambda qp, s, a: apply_serving_resident(
        qp, x, s, CFG, merge_pack(a, statics)))(qp8, scales, arrs)
    agree = bool((jnp.argmax(lc, -1) == jnp.argmax(lr, -1)).all())
    rel = float(jnp.linalg.norm(lr - lc) / jnp.linalg.norm(lc))
    mark(f"device logits: argmax agree {agree}, rel {rel:.4f}")

    variants = {"classic": step_classic, "resident_chain": step_resident}
    best = {}
    for p in range(2):
        for name, fn in variants.items():
            t = chained_device_time(fn, x, lo=200, hi=1500, reps=3,
                                    args=(qp8, scales, arrs))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    out = {"batch": batch, "us": us, "argmax_agree": agree,
           "logit_rel": round(rel, 4),
           "speedup": round(us["classic"] / us["resident_chain"], 3)}
    print(json.dumps(out, indent=1))
    name = ("resident_chain_ab_r3.json" if batch == 1
            else f"resident_chain_ab_b{batch}_r3.json")
    with open(name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
