"""Per-layer 1x1-conv routing probe: XLA conv emitter vs the Pallas fused
int8 GEMM (kernels/matmul_int8.py) on the EXACT ResNet-50 b128 1x1 shapes.

The b128 per-layer sweep shows the 1x1 stride-1 layers running at 64-84%
SOL through XLA while the 3x3 layers hit 80-90% — this probe decides,
shape by shape, whether routing 1x1 convs to the Pallas GEMM (with its
fused requant epilogue) beats the vendor path, building the measured
routing table that ops/conv.py's "auto" backend can use.

Run: python -m lowbitdnn_project_tpu.bench.one_by_one_probe [--batch 128]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.kernels.matmul_int8 import int8_matmul_fused  # noqa: E402
from lowbitdnn_project_tpu.ops.conv import conv2d_int32                  # noqa: E402
from lowbitdnn_project_tpu.utils.timing import chained_device_time       # noqa: E402

# (name, hw, cin, cout, count) — every stride-1 1x1 in ResNet-50
SHAPES = [
    ("l1.0.c1", 56, 64, 64, 1),
    ("l1.x.c3", 56, 64, 256, 4),     # c3 + ds
    ("l1.n.c1", 56, 256, 64, 2),
    ("l2.0.c1", 56, 256, 128, 1),
    ("l2.0.c3", 28, 128, 512, 1),
    ("l2.n.c1", 28, 512, 128, 3),
    ("l2.n.c3", 28, 128, 512, 3),
    ("l3.0.c1", 28, 512, 256, 1),
    ("l3.0.c3", 14, 256, 1024, 1),
    ("l3.n.c1", 14, 1024, 256, 5),
    ("l3.n.c3", 14, 256, 1024, 5),
    ("l4.0.c1", 14, 1024, 512, 1),
    ("l4.0.c3", 7, 512, 2048, 1),
    ("l4.n.c1", 7, 2048, 512, 2),
    ("l4.n.c3", 7, 512, 2048, 2),
]


def probe(b, hw, cin, cout, reps=3, mode="gemm"):
    rng = np.random.default_rng(0)
    m = b * hw * hw
    a = jnp.asarray(rng.integers(-50, 51, (m, cin)), jnp.int8)
    x = a.reshape(b, hw, hw, cin)
    lo, hi = (20, 220) if m >= 4096 else (50, 1050)
    if mode == "w4a8":
        from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
            pack_int4_rows, w4a8_matmul_fused)
        w = jnp.asarray(rng.integers(-7, 8, (cin, cout)), jnp.int8)
        wp = pack_int4_rows(w)
    else:
        w = jnp.asarray(rng.integers(-50, 51, (cin, cout)), jnp.int8)
        wp = w
    scale = jnp.full((cout,), 0.01, jnp.float32)
    bias = jnp.ones((cout,), jnp.float32)
    os_ = jnp.asarray(0.5, jnp.float32)
    flops = 2 * m * cin * cout

    def step_xla(c, w, scale, bias):
        acc = conv2d_int32(c, w.reshape(1, 1, cin, cout))
        out = acc.astype(jnp.float32) * scale + bias
        q = jnp.clip(jnp.round(out * 2.0), -127, 127).astype(jnp.int8)
        s = jnp.sum(q.astype(jnp.int32))
        return c ^ (s.astype(jnp.int8) & 1)

    if mode == "w4a8":
        def step_pallas(c, wp, scale, bias):
            out = w4a8_matmul_fused(c, wp, scale, bias, os_, requant=True)
            s = jnp.sum(out.astype(jnp.int32))
            return c ^ (s.astype(jnp.int8) & 1)
    else:
        def step_pallas(c, wp, scale, bias):
            out = int8_matmul_fused(c, wp, scale, bias, os_, requant=True)
            s = jnp.sum(out.astype(jnp.int32))
            return c ^ (s.astype(jnp.int8) & 1)

    t_xla = chained_device_time(step_xla, x, lo=lo, hi=hi, reps=reps,
                                args=(w, scale, bias))
    t_p = chained_device_time(step_pallas, a, lo=lo, hi=hi, reps=reps,
                              args=(wp, scale, bias))
    return dict(
        batch=b, hw=hw, cin=cin, cout=cout, mode=mode,
        xla_us=round(t_xla * 1e6, 2), gemm_us=round(t_p * 1e6, 2),
        xla_tops=round(flops / t_xla / 1e12, 1),
        gemm_tops=round(flops / t_p / 1e12, 1),
        speedup=round(t_xla / t_p, 3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--w4a8", action="store_true",
                    help="compare the W4A8 packed-int4 kernel instead of "
                         "the int8 Pallas GEMM")
    args = ap.parse_args()
    results = []
    saved = 0.0
    for name, hw, cin, cout, count in SHAPES:
        r = probe(args.batch, hw, cin, cout,
                  mode="w4a8" if args.w4a8 else "gemm")
        r["name"], r["count"] = name, count
        results.append(r)
        if r["gemm_us"] > 0.5:      # sub-floor records can't be trusted
            saved += max((r["xla_us"] - r["gemm_us"]) * count, 0.0)
        print(f"{name:>8} {hw:>3}x{hw:<3} {cin:>4}->{cout:<4} x{count}: "
              f"xla {r['xla_us']:>7}us ({r['xla_tops']:>5})  "
              f"gemm {r['gemm_us']:>7}us ({r['gemm_tops']:>5})  "
              f"x{r['speedup']}", flush=True)
    print(f"routing best-of: saves {saved:.0f}us/forward at b{args.batch}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
