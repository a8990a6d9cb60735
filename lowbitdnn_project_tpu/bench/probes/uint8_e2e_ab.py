"""One e2e number for the uint8 (asymmetric activation) chain.

Round 3 priced the zero-point row-sum correction at ~26% PER-OP
(wide-plane standalone); round 4 measured the in-graph int32 correction
breaking conv->requant fusion e2e (0.38x/0.52x of symmetric at b1/b32,
uint8_e2e_ab_r4.json). Round 5 folds the correction into the bias vector
(zp is a compile-time constant, rowsum(w) a weight constant) so the
big-tensor graph is structurally identical to the symmetric chain
(ops/conv.py zp_fold="bias"). This probe runs the b32 flagship regime and
the b1 serving regime through three variants — symmetric, unsigned with the
bias fold (new default), unsigned with the r4 int32-domain correction —
interleaved min-of-2, plus the on-device logit-error comparison that
motivates uint8 in the first place.

Run: python -m lowbitdnn_project_tpu.bench.probes.uint8_e2e_ab [batches...]
Writes uint8_e2e_ab_r5.json.
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
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def main(batches=(1, 32)):
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

    def chain(qp, c, s, **kw):
        return resnet.apply_quantized_int8chain(qp, c, s, CFG, backend="xla",
                                                **kw)

    VARIANTS = (
        ("symmetric", {}),
        ("uns_bias", {"act_unsigned": True, "zp_fold": "bias"}),
        ("uns_acc", {"act_unsigned": True, "zp_fold": "acc"}),
    )

    results = []
    for batch in batches:
        x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

        # float-reference logit errors on device (the accuracy side of the
        # trade this probe prices); also checks the bias fold's numerics
        # track the exact int32 correction
        lf = jax.jit(lambda: resnet.apply_fp32(params, x, CFG))()
        errs = {}
        for name, kw in VARIANTS:
            lq = jax.jit(lambda kw=kw: chain(qp8, x, scales, **kw))()
            errs[name] = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
        mark(f"b{batch} logit relerr: " +
             " ".join(f"{n} {e:.4f}" for n, e in errs.items()))

        lo, hi = (200, 1700) if batch == 1 else (30, 330)
        best = {}
        for p in range(2):
            for name, kw in VARIANTS:
                def step(c, qp, s, kw=kw):
                    return chain_via_scalar(c, chain(qp, c, s, **kw))
                t = chained_device_time(step, x, lo=lo, hi=hi, reps=3,
                                        args=(qp8, scales))
                best[name] = min(best.get(name, t), t)
                mark(f"b{batch} {name} pass{p}: {t * 1e6:8.1f} us")

        us = {k: round(v * 1e6, 1) for k, v in best.items()}
        row = {"batch": batch, "us": us,
               "uns_bias_vs_symmetric": round(
                   us["symmetric"] / us["uns_bias"], 3),
               "uns_acc_vs_symmetric": round(
                   us["symmetric"] / us["uns_acc"], 3),
               "logit_relerr": {k: round(v, 4) for k, v in errs.items()}}
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open("uint8_e2e_ab_r5.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (1, 32))
