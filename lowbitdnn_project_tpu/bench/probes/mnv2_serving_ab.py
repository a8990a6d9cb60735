"""MobileNet-V2 serving A/B: classic int8 chain vs the b1 resident chain
(kernels/mnv2_resident.py) + the bf16 baseline, b1/b2/b4/b8 latency rows.

Config 4 is the one BASELINE config shipping slower than bf16 at batch
(depthwise = VPU roofline, mobilenet_ab_r3.json); the b1 dispatch-bound
regime is where the resident technique wins on ResNet. This probe fills
the never-measured MobileNet serving rows and decides the b1 routing.

Run: python -m lowbitdnn_project_tpu.bench.probes.mnv2_serving_ab
Writes mnv2_serving_ab_r4.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import mobilenet                    # noqa: E402
from lowbitdnn_project_tpu.kernels.mnv2_resident import (             # noqa: E402
    apply_mnv2_serving_resident, merge_pack_mnv2, pack_mnv2_resident,
    split_pack_mnv2)
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = mobilenet.MOBILENET_V2


def main(batches=(1, 2, 4, 8)):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    key = jax.random.key(0)
    params = mobilenet.init_params(key, CFG)
    qp = jax.jit(lambda p: mobilenet.quantize_params(p, CFG))(params)
    cal = jax.random.normal(jax.random.key(1), (8, 224, 224, 3)) * 0.5
    scales = mobilenet.calibrate_act_scales(params, [cal], CFG)
    arrs, statics = split_pack_mnv2(pack_mnv2_resident(qp, scales, CFG))
    mark("built + packed")

    results = []
    for batch in batches:
        x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

        def step_classic(c, q, s, a):
            out = mobilenet.apply_quantized_int8chain(q, c, s, CFG,
                                                      backend="xla")
            return chain_via_scalar(c, out)

        def step_bf16(c, q, s, a):
            out = mobilenet.apply_fp32(
                jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16)
                    if hasattr(v, "astype") else v, params),
                c.astype(jnp.bfloat16), CFG)
            return chain_via_scalar(c, out)

        def step_resident(c, q, s, a):
            out = apply_mnv2_serving_resident(
                q, c, s, CFG, merge_pack_mnv2(a, statics))
            return chain_via_scalar(c, out)

        variants = {"classic_int8": step_classic, "bf16": step_bf16}
        ok = {}
        if batch <= 2:
            try:
                lr = jax.jit(lambda q, s, a: apply_mnv2_serving_resident(
                    q, x, s, CFG, merge_pack_mnv2(a, statics)))(
                        qp, scales, arrs)
                l32 = jax.jit(
                    lambda q, s: mobilenet.apply_quantized_int8chain(
                        q, x, s, CFG, backend="xla", stem_domain="int8",
                        dw_domain="int8", act_dtype=jnp.float32))(qp, scales)
                agree = bool((jnp.argmax(lr, -1) == jnp.argmax(l32, -1))
                             .all())
                rel = float(jnp.linalg.norm(lr - l32) / jnp.linalg.norm(l32))
                ok["resident"] = agree
                mark(f"b{batch} resident: argmax agree {agree} rel {rel:.4f}")
                if agree:
                    variants["resident"] = step_resident
            except Exception as e:  # noqa: BLE001 — VMEM OOM reported per-batch
                ok["resident"] = f"error: {str(e)[:120]}"
                mark(f"b{batch} resident: {str(e)[:120]}")

        lo, hi = (200, 1700) if batch <= 2 else (150, 1200)
        best = {}
        for p in range(2):
            for name, fn in variants.items():
                t = chained_device_time(fn, x, lo=lo, hi=hi, reps=3,
                                        args=(qp, scales, arrs))
                best[name] = min(best.get(name, t), t)
                mark(f"b{batch} {name} pass{p}: {t * 1e6:8.1f} us")

        us = {k: round(v * 1e6, 1) for k, v in best.items()}
        row = {"batch": batch, "us": us, "ok": ok}
        if "resident" in us:
            row["resident_vs_classic"] = round(
                us["classic_int8"] / us["resident"], 3)
        row["int8_vs_bf16"] = round(us["bf16"] / us["classic_int8"], 3)
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open("mnv2_serving_ab_r4.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (1, 2, 4, 8))
