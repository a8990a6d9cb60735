"""One e2e number for the uint8 (asymmetric activation) chain.

Round 3 priced the zero-point row-sum correction at ~26% PER-OP
(wide-plane standalone) — but this project has six documented cases of
per-op costs not surviving in-chain fusion, in both directions. This probe
runs the b32 flagship regime and the b1 serving regime through
`act_unsigned=True` vs the symmetric chain, interleaved min-of-2, plus the
on-device logit-error comparison that motivates uint8 in the first place
(asymmetric post-ReLU quantization cuts ResNet logit error 0.066->0.045,
accuracy_parity.json).

Run: python -m lowbitdnn_project_tpu.bench.probes.uint8_e2e_ab [batches...]
Writes uint8_e2e_ab_r4.json.
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

    results = []
    for batch in batches:
        x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

        def step_sym(c, qp, s):
            out = resnet.apply_quantized_int8chain(qp, c, s, CFG,
                                                   backend="xla")
            return chain_via_scalar(c, out)

        def step_uns(c, qp, s):
            out = resnet.apply_quantized_int8chain(qp, c, s, CFG,
                                                   backend="xla",
                                                   act_unsigned=True)
            return chain_via_scalar(c, out)

        # float-reference logit errors on device (the accuracy side of the
        # trade this probe prices)
        lf = jax.jit(lambda: resnet.apply_fp32(params, x, CFG))()
        ls = jax.jit(lambda: resnet.apply_quantized_int8chain(
            qp8, x, scales, CFG, backend="xla"))()
        lu = jax.jit(lambda: resnet.apply_quantized_int8chain(
            qp8, x, scales, CFG, backend="xla", act_unsigned=True))()
        err_s = float(jnp.linalg.norm(ls - lf) / jnp.linalg.norm(lf))
        err_u = float(jnp.linalg.norm(lu - lf) / jnp.linalg.norm(lf))
        mark(f"b{batch} logit relerr: sym {err_s:.4f} uns {err_u:.4f}")

        lo, hi = (200, 1700) if batch == 1 else (30, 330)
        best = {}
        for p in range(2):
            for name, fn in (("symmetric", step_sym), ("unsigned", step_uns)):
                t = chained_device_time(fn, x, lo=lo, hi=hi, reps=3,
                                        args=(qp8, scales))
                best[name] = min(best.get(name, t), t)
                mark(f"b{batch} {name} pass{p}: {t * 1e6:8.1f} us")

        us = {k: round(v * 1e6, 1) for k, v in best.items()}
        row = {"batch": batch, "us": us,
               "unsigned_vs_symmetric": round(
                   us["symmetric"] / us["unsigned"], 3),
               "logit_relerr_sym": round(err_s, 4),
               "logit_relerr_uns": round(err_u, 4)}
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open("uint8_e2e_ab_r4.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (1, 32))
