"""Measure the flat pitched-layout conv (kernels/conv_flat.py, direct-conv
v3) against XLA's int8 conv emitter, shape by shape — the kernel-lab
compare harness for this generation (reference analogue:
cpp/apps/custom_convolution/compare.cu).

Run on the TPU:  python -m lowbitdnn_project_tpu.bench.flat_probe [--batch 32]

Both sides are timed in their *resident* layouts (the flat kernel chains
layer-to-layer without relayout, so to_flat/from_flat are not part of the
steady-state cost; XLA likewise consumes/produces NHWC).  Effective TOPS are
reported against the true conv FLOPs (pad-row compute counts as overhead,
not work).
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.kernels.conv_flat import (      # noqa: E402
    conv_flat_int8, flat_meta, to_flat,
)
from lowbitdnn_project_tpu.ops.conv import conv2d_int32    # noqa: E402
from lowbitdnn_project_tpu.utils.timing import chained_device_time  # noqa: E402


def probe_shape(b, hw, c, k, *, bm=512, bk=None, requant=True, reps=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-50, 51, (b, hw, hw, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-50, 51, (3, 3, c, k)), jnp.int8)
    scale = jnp.full((k,), 0.01, jnp.float32)
    bias = jnp.ones((k,), jnp.float32)
    os_ = jnp.asarray(0.5, jnp.float32)
    m = flat_meta(b, hw, hw)
    xf = to_flat(x, m)
    flops = 2 * b * hw * hw * 9 * c * k

    def step_flat(cf, w, scale, bias):
        out = conv_flat_int8(cf, w, scale, bias, os_, meta=m,
                             requant=True, bm=bm, bk=bk)
        s = jnp.sum(out.astype(jnp.int32))
        return cf ^ (s.astype(jnp.int8) & 1)

    def step_xla(cx, w, scale, bias):
        acc = conv2d_int32(cx, w, (1, 1), (1, 1))
        out = acc.astype(jnp.float32) * scale + bias
        q = jnp.clip(jnp.round(out * 2.0), -127, 127).astype(jnp.int8)
        s = jnp.sum(q.astype(jnp.int32))
        return cx ^ (s.astype(jnp.int8) & 1)

    # correctness first (bit-exact vs the XLA oracle, requant domain)
    out_f = conv_flat_int8(xf, w, scale, bias, os_, meta=m, requant=True,
                           bm=bm, bk=bk)
    from lowbitdnn_project_tpu.kernels.conv_flat import from_flat
    got = np.asarray(from_flat(out_f, m))
    acc = conv2d_int32(x, w, (1, 1), (1, 1)).astype(jnp.float32)
    ref = jnp.clip(jnp.round((acc * scale + bias) * 2.0), -127, 127)
    ref = np.asarray(ref.astype(jnp.int8))
    assert (got == ref).all(), f"MISMATCH b{b} hw{hw} c{c} k{k}"

    t_flat = chained_device_time(step_flat, xf, lo=10, hi=110, reps=reps,
                                 args=(w, scale, bias))
    t_xla = chained_device_time(step_xla, x, lo=10, hi=110, reps=reps,
                                args=(w, scale, bias))
    return dict(
        batch=b, hw=hw, cin=c, cout=k, bm=bm, bk=bk or 0,
        flat_us=round(t_flat * 1e6, 2), xla_us=round(t_xla * 1e6, 2),
        flat_tops=round(flops / t_flat / 1e12, 1),
        xla_tops=round(flops / t_xla / 1e12, 1),
        speedup=round(t_xla / t_flat, 3),
    )


def probe_block(b, hw, c, cmid, *, bm=512, reps=3):
    """Fused flat bottleneck block vs the 3-conv XLA int8 chain."""
    from lowbitdnn_project_tpu.kernels.block_flat import bottleneck_flat_int8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-50, 51, (b, hw, hw, c)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-50, 51, (1, 1, c, cmid)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-50, 51, (3, 3, cmid, cmid)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-50, 51, (1, 1, cmid, c)), jnp.int8)
    s1 = jnp.full((cmid,), 0.013, jnp.float32)
    s2 = jnp.full((cmid,), 0.017, jnp.float32)
    s3 = jnp.full((c,), 0.011, jnp.float32)
    b1 = jnp.ones((cmid,), jnp.float32)
    b2 = jnp.ones((cmid,), jnp.float32)
    b3 = jnp.ones((c,), jnp.float32)
    scales = jnp.asarray([0.09, 0.12, 0.05, 0.15], jnp.float32)
    m = flat_meta(b, hw, hw)
    xf = to_flat(x, m)
    flops = 2 * b * hw * hw * (c * cmid * 2 + 9 * cmid * cmid)
    ws = (w1[0, 0], w2, w3[0, 0])

    def step_flat(cf, w1m, w2m, w3m):
        out = bottleneck_flat_int8(cf, w1m, w2m, w3m, scales,
                                   s1, b1, s2, b2, s3, b3, meta=m, bm=bm)
        s = jnp.sum(out.astype(jnp.int32))
        return cf ^ (s.astype(jnp.int8) & 1)

    def requant(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    def step_xla(cx, w1m, w2m, w3m):
        a1 = conv2d_int32(cx, w1)
        y1 = requant(jnp.maximum(a1.astype(jnp.float32) * s1 + b1, 0.0),
                     scales[0])
        a2 = conv2d_int32(y1, w2, (1, 1), (1, 1))
        y2 = requant(jnp.maximum(a2.astype(jnp.float32) * s2 + b2, 0.0),
                     scales[1])
        a3 = conv2d_int32(y2, w3)
        h3 = a3.astype(jnp.float32) * s3 + b3 \
            + cx.astype(jnp.float32) * scales[2]
        out = requant(jnp.maximum(h3, 0.0), scales[3])
        s = jnp.sum(out.astype(jnp.int32))
        return cx ^ (s.astype(jnp.int8) & 1)

    # correctness: fused vs XLA chain, bit-exact
    from lowbitdnn_project_tpu.kernels.conv_flat import from_flat
    got = np.asarray(from_flat(
        bottleneck_flat_int8(xf, *ws, scales, s1, b1, s2, b2, s3, b3,
                             meta=m, bm=bm), m))
    a1 = conv2d_int32(x, w1)
    y1 = requant(jnp.maximum(a1.astype(jnp.float32) * s1 + b1, 0.0), scales[0])
    a2 = conv2d_int32(y1, w2, (1, 1), (1, 1))
    y2 = requant(jnp.maximum(a2.astype(jnp.float32) * s2 + b2, 0.0), scales[1])
    a3 = conv2d_int32(y2, w3)
    ref = np.asarray(requant(jnp.maximum(
        a3.astype(jnp.float32) * s3 + b3
        + x.astype(jnp.float32) * scales[2], 0.0), scales[3]))
    assert (got == ref).all(), f"BLOCK MISMATCH b{b} hw{hw} c{c} cmid{cmid}"

    t_flat = chained_device_time(step_flat, xf, lo=10, hi=110, reps=reps,
                                 args=ws)
    t_xla = chained_device_time(step_xla, x, lo=10, hi=110, reps=reps,
                                args=ws)
    return dict(
        kind="block", batch=b, hw=hw, cin=c, cmid=cmid, bm=bm,
        flat_us=round(t_flat * 1e6, 2), xla_us=round(t_xla * 1e6, 2),
        flat_tops=round(flops / t_flat / 1e12, 1),
        xla_tops=round(flops / t_xla / 1e12, 1),
        speedup=round(t_xla / t_flat, 3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bm", type=int, default=512)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--shapes", type=str, default="")
    ap.add_argument("--block", action="store_true",
                    help="probe the fused bottleneck block instead")
    args = ap.parse_args()

    results = []
    if args.block:
        # (hw, c_outer, cmid) of ResNet-50 stride-1 bottleneck blocks
        shapes = [(56, 256, 64), (28, 512, 128), (14, 1024, 256),
                  (7, 2048, 512)]
        if args.shapes:
            shapes = [tuple(int(v) for v in s.split("x"))
                      for s in args.shapes.split(",")]
        for hw, c, cmid in shapes:
            r = probe_block(args.batch, hw, c, cmid, bm=args.bm)
            results.append(r)
            print(f"b{r['batch']} block {hw}x{hw} c{c} mid{cmid}: "
                  f"flat {r['flat_us']}us ({r['flat_tops']} TOPS)  "
                  f"xla {r['xla_us']}us ({r['xla_tops']} TOPS)  "
                  f"speedup x{r['speedup']}", flush=True)
    else:
        shapes = [(28, 128, 128), (14, 256, 256), (56, 256, 256)]
        if args.shapes:
            shapes = [tuple(int(v) for v in s.split("x"))
                      for s in args.shapes.split(",")]
        for hw, c, k in shapes:
            r = probe_shape(args.batch, hw, c, k, bm=args.bm)
            results.append(r)
            print(f"b{r['batch']} {hw}x{hw} {c}->{k}: "
                  f"flat {r['flat_us']}us ({r['flat_tops']} TOPS)  "
                  f"xla {r['xla_us']}us ({r['xla_tops']} TOPS)  "
                  f"speedup x{r['speedup']}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
