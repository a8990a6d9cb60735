"""MobileNet-V2 e2e A/B: bf16 vs int8 chain vs int8-with-float-depthwise.

Round-2 verdict weak point: MobileNet INT8 ships 0.94x bf16. Depthwise is
VPU/bandwidth-bound (no MXU role — KERNEL_LAB "closed by arithmetic"), so
int8 buys nothing on the dw layers but still pays a requant epilogue there.
Hypothesis: dw_domain="float" (pointwise stays int8 on the MXU, dw runs in
bf16 with the quantize fused into its epilogue) recovers the loss.

Variants interleaved across 2 passes, per-variant min (relay clock drift).

Run: python -m lowbitdnn_project_tpu.bench.probes.mobilenet_bisect [batch...]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import mobilenet                   # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                     # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = mobilenet.MOBILENET_V2


def main(batches=(128,)):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    @jax.jit
    def build():
        params = mobilenet.init_params(jax.random.key(0), CFG)
        qp = mobilenet.quantize_params(params, CFG, bits=8)
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        return params, qp, pb

    params, qp, pb = build()
    x8 = jnp.ones((8, 224, 224, 3), jnp.float32) * 0.3
    scales = mobilenet.calibrate_act_scales(params, [x8], CFG)
    mark("built + calibrated")

    rows = []
    for b in batches:
        x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.3
        xb = x.astype(jnp.bfloat16)

        def bf16_step(c, p):
            return chain_via_scalar(c, mobilenet.apply_fp32(p, c, CFG))

        def int8_step(c, p, s):   # stem_domain default: float stem
            return chain_via_scalar(c, mobilenet.apply_quantized_int8chain(
                p, c, s, CFG))

        def stem8_step(c, p, s):  # the pre-bisect all-int8 variant
            return chain_via_scalar(c, mobilenet.apply_quantized_int8chain(
                p, c, s, CFG, stem_domain="int8"))

        def dwf_step(c, p, s):
            return chain_via_scalar(c, mobilenet.apply_quantized_int8chain(
                p, c, s, CFG, dw_domain="float", stem_domain="int8"))

        variants = (("bf16", bf16_step, xb, (pb,)),
                    ("int8", int8_step, x, (qp, scales)),
                    ("int8_stem8", stem8_step, x, (qp, scales)),
                    ("int8_dwfloat", dwf_step, x, (qp, scales)))
        best = {}
        for p in range(2):
            for name, step, xx, args in variants:
                t = chained_device_time(step, xx, lo=10, hi=110, reps=3,
                                        args=args)
                best[name] = min(best.get(name, t), t)
                mark(f"b{b} {name} pass{p}: {t * 1e6:9.1f} us "
                     f"({b / t:8.0f} img/s)")
        row = {"batch": b}
        for name in ("bf16", "int8", "int8_stem8", "int8_dwfloat"):
            row[f"{name}_us"] = round(best[name] * 1e6, 1)
            row[f"{name}_img_s"] = round(b / best[name], 0)
        row["int8_vs_bf16"] = round(best["bf16"] / best["int8"], 3)
        row["stem8_vs_bf16"] = round(best["bf16"] / best["int8_stem8"], 3)
        row["dwfloat_vs_bf16"] = round(best["bf16"] / best["int8_dwfloat"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("mobilenet_ab_r3.json", "w") as f:
        json.dump(rows, f, indent=1)


def bisect(b=128, cuts=(-1, 2, 5, 8, 11, 14, 16)):
    """Prefix-time bisect: where do the int8-vs-bf16 microseconds diverge?

    T(stop_after_block=k) per variant; segment cost = T(k) - T(prev k).
    cuts=-1 is the stem alone; the tail (head+fc) = T(full) - T(16).
    """
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    @jax.jit
    def build():
        params = mobilenet.init_params(jax.random.key(0), CFG)
        qp = mobilenet.quantize_params(params, CFG, bits=8)
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        return params, qp, pb

    params, qp, pb = build()
    scales = mobilenet.calibrate_act_scales(
        params, [jnp.ones((8, 224, 224, 3), jnp.float32) * 0.3], CFG)
    mark("built + calibrated")
    x = jnp.ones((b, 224, 224, 3), jnp.float32) * 0.3
    xb = x.astype(jnp.bfloat16)

    points = list(cuts) + [None]           # None = full model
    res = {"batch": b, "int8": {}, "bf16": {}}
    for p in range(2):
        for k in points:
            key = "full" if k is None else str(k)

            def int8_step(c, qp, s, _k=k):
                out = mobilenet.apply_quantized_int8chain(
                    qp, c, s, CFG, stop_after_block=_k)
                return chain_via_scalar(c, out)

            def bf16_step(c, pb, _k=k):
                out = mobilenet.apply_fp32(pb, c, CFG, stop_after_block=_k)
                return chain_via_scalar(c, out)

            t8 = chained_device_time(int8_step, x, lo=10, hi=110, reps=3,
                                     args=(qp, scales))
            tf = chained_device_time(bf16_step, xb, lo=10, hi=110, reps=3,
                                     args=(pb,))
            res["int8"][key] = min(res["int8"].get(key, t8), t8)
            res["bf16"][key] = min(res["bf16"].get(key, tf), tf)
            mark(f"cut {key} pass{p}: int8 {t8 * 1e6:8.1f} us  "
                 f"bf16 {tf * 1e6:8.1f} us")

    # segment attribution
    segs = []
    prev8 = prevf = 0.0
    for k in points:
        key = "full" if k is None else str(k)
        t8, tf = res["int8"][key], res["bf16"][key]
        segs.append({"upto": key,
                     "int8_us": round((t8 - prev8) * 1e6, 1),
                     "bf16_us": round((tf - prevf) * 1e6, 1),
                     "delta_us": round(((t8 - prev8) - (tf - prevf)) * 1e6, 1)})
        prev8, prevf = t8, tf
    out = {"batch": b,
           "prefix_us": {v: {k: round(t * 1e6, 1) for k, t in d.items()}
                         for v, d in res.items() if v != "batch"},
           "segments": segs}
    print(json.dumps(out, indent=1), flush=True)
    with open("mobilenet_bisect_r3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bisect":
        bisect(*(int(a) for a in sys.argv[2:]))
    else:
        main(tuple(int(a) for a in sys.argv[1:]) or (128,))
