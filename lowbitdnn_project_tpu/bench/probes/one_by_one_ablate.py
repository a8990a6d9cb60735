"""1x1-conv ablation at b128: explain the 64-84%-SOL class.

Round-2 left the ResNet 1x1 layers (64-84% of the combined roofline at
b128) as the one layer class with no measured ceiling argument. This probe
decomposes two candidate causes per representative shape:

  * epilogue: requant-int8 vs float-bf16 vs raw-int32 outputs, each scored
    against ITS OWN roofline (output bytes differ 1/2/4x — raw int32 pays
    4x the write traffic, so "drop the epilogue" is not free)
  * emitter/M-geometry: the identical contraction expressed as a
    dot_general GEMM (M = B*OH*OW rows) instead of the conv emitter

Variants are timed with the interleaved min-of-2 protocol (relay clock
drift, CLAUDE.md). Standalone numbers serve the CEILING argument only —
routing decisions still require e2e A/B (four confirmed probe-vs-e2e
mis-rankings).

Run: python -m lowbitdnn_project_tpu.bench.probes.one_by_one_ablate [batch]
Writes one_by_one_ablate_r3.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.bench.roofline import (                   # noqa: E402
    conv_cost, detect_chip, matmul_cost, roofline_pct)
from lowbitdnn_project_tpu.utils.timing import chained_device_time   # noqa: E402

# representative 1x1 body layers (bench/harness.py resnet50 table names)
SHAPES = [
    ("l2.n.c1", 28, 512, 128),
    ("l2.n.c3", 28, 128, 512),
    ("l3.n.c1", 14, 1024, 256),
    ("l3.n.c3", 14, 256, 1024),
]


def main(batch=128):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    rng = np.random.default_rng(0)
    chip = detect_chip()
    out_rows = []

    for name, h, cin, cout in SHAPES:
        x = jnp.asarray(rng.integers(-50, 51, (batch, h, h, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-50, 51, (1, 1, cin, cout)), jnp.int8)
        a = x.reshape(batch * h * h, cin)
        wm = w.reshape(cin, cout)
        scale = jnp.full((cout,), 0.01, jnp.float32)
        m_rows = batch * h * h

        def conv_acc(c):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        def gemm_acc(c):
            return jax.lax.dot_general(
                c, wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def chain(c, out):
            s = jnp.sum(out.astype(jnp.int32)) if out.dtype in (
                jnp.int8, jnp.int32) else jnp.sum(out).astype(jnp.int32)
            return c ^ (s.astype(jnp.int8) & 1)

        def requant(out_f):
            return jnp.clip(jnp.round(out_f * 0.5), -127, 127) \
                .astype(jnp.int8)

        variants = {
            # (step, out_bytes, kind)
            "conv_requant": (lambda c: chain(c, requant(
                conv_acc(c).astype(jnp.float32) * scale)), 1, "conv"),
            "conv_bf16": (lambda c: chain(c, (
                conv_acc(c).astype(jnp.float32) * scale)
                .astype(jnp.bfloat16)), 2, "conv"),
            "conv_int32": (lambda c: chain(c, conv_acc(c)), 4, "conv"),
            "gemm_requant": (lambda c: chain(c, requant(
                gemm_acc(c).astype(jnp.float32) * scale)), 1, "gemm"),
            "gemm_int32": (lambda c: chain(c, gemm_acc(c)), 4, "gemm"),
        }

        best = {}
        for p in range(2):
            for vname, (step, ob, kind) in variants.items():
                init = a if kind == "gemm" else x
                t = chained_device_time(step, init, lo=50, hi=550)
                if t * 500 < 0.05:   # relay-jitter floor: re-measure longer
                    iters = min(20000, int(0.1 / max(t, 1e-7)))
                    t = chained_device_time(step, init, lo=50,
                                            hi=50 + iters)
                best[vname] = min(best.get(vname, t), t)
                mark(f"{name} {vname} pass{p}: {t * 1e6:7.1f} us")

        row = {"name": name, "batch": batch, "h": h, "cin": cin,
               "cout": cout, "m_rows": m_rows}
        for vname, (step, ob, kind) in variants.items():
            t = best[vname]
            cost = (matmul_cost(m_rows, cin, cout, out_bytes=ob)
                    if kind == "gemm" else
                    conv_cost(batch, h, h, 1, 1, cin, cout, h, h,
                              out_bytes=ob))
            row[vname] = {
                "us": round(t * 1e6, 1),
                "tops": round(cost.flops / t / 1e12, 1),
                "sol_pct": round(roofline_pct(t, cost, chip), 1),
            }
        out_rows.append(row)
        print(json.dumps(row), flush=True)

    with open("one_by_one_ablate_r3.json", "w") as f:
        json.dump(out_rows, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
