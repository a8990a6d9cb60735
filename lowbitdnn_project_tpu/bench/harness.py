"""Config-driven benchmark sweep — the engine's answer to the reference's
JSON-config cuDNN benchmark app (cpp/apps/benchmark.cpp + config.json) and
check harness (cpp/int8conv/check.cu).

Per-kernel: measured device time (chained fori_loop method, utils/timing.py),
achieved TOPS, % of roofline speed-of-light (bench/roofline.py), written as
JSON records like the reference's output.json (benchmark.cpp:162-167).
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.bench.roofline import (
    conv_cost,
    detect_chip,
    roofline_pct,
)
from lowbitdnn_project_tpu.ops.conv import conv2d_int32
from lowbitdnn_project_tpu.utils.timing import chained_device_time


def resnet50_conv_layers(batch: int = 32) -> List[Dict[str, Any]]:
    """Every distinct conv of ResNet-50 at 224x224 with its multiplicity."""
    layers = [dict(name="stem", h=224, cin=3, cout=64, k=7, stride=2,
                   pad=3, count=1)]
    stage_blocks = (3, 4, 6, 3)
    h = 56
    cin = 64
    for s, nblocks in enumerate(stage_blocks):
        cmid = 64 * (2 ** s)
        cout = cmid * 4
        stride = 1 if s == 0 else 2
        # first block (with downsample)
        layers += [
            dict(name=f"l{s+1}.0.c1", h=h, cin=cin, cout=cmid, k=1, stride=1,
                 pad=0, count=1),
            dict(name=f"l{s+1}.0.c2", h=h, cin=cmid, cout=cmid, k=3,
                 stride=stride, pad=1, count=1),
            dict(name=f"l{s+1}.0.c3", h=h // stride, cin=cmid, cout=cout, k=1,
                 stride=1, pad=0, count=1),
            dict(name=f"l{s+1}.0.ds", h=h, cin=cin, cout=cout, k=1,
                 stride=stride, pad=0, count=1),
        ]
        h //= stride
        # remaining blocks
        layers += [
            dict(name=f"l{s+1}.n.c1", h=h, cin=cout, cout=cmid, k=1, stride=1,
                 pad=0, count=nblocks - 1),
            dict(name=f"l{s+1}.n.c2", h=h, cin=cmid, cout=cmid, k=3, stride=1,
                 pad=1, count=nblocks - 1),
            dict(name=f"l{s+1}.n.c3", h=h, cin=cmid, cout=cout, k=1, stride=1,
                 pad=0, count=nblocks - 1),
        ]
        cin = cout
    for l in layers:
        l["batch"] = batch
    return layers


def bench_conv_layer(
    layer: Dict[str, Any],
    *,
    requant: bool = True,
    backend: str = "xla",
    seed: int = 0,
) -> Dict[str, Any]:
    """Time one int8 conv layer (+fused requant epilogue) on device."""
    rng = np.random.default_rng(seed)
    b, h, cin, cout = layer["batch"], layer["h"], layer["cin"], layer["cout"]
    k, stride, pad = layer["k"], layer["stride"], layer["pad"]
    oh = (h + 2 * pad - k) // stride + 1

    x = jnp.asarray(rng.integers(-50, 51, (b, h, h, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-50, 51, (k, k, cin, cout)), jnp.int8)
    scale = jnp.full((cout,), 0.01, jnp.float32)
    bias = jnp.ones((cout,), jnp.float32)

    def step(c):
        acc = conv2d_int32(c, w, (stride, stride), (pad, pad))
        out = acc.astype(jnp.float32) * scale + bias
        if requant:
            q = jnp.clip(jnp.round(out * 0.5), -127, 127).astype(jnp.int8)
        else:
            q = out.astype(jnp.bfloat16)
        # fold output back into the int8 input (full dependency)
        s = jnp.sum(q.astype(jnp.int32)) if requant else jnp.sum(q)
        return c ^ (s.astype(jnp.int8) & 1)

    # rough pass to size the iteration count, then a precise pass aiming
    # for ~100ms of measured delta (relay jitter is ~ms-scale)
    t = chained_device_time(step, x, lo=10, hi=60)
    iters = max(50, min(20000, int(0.1 / max(t, 1e-7))))
    t = chained_device_time(step, x, lo=50, hi=50 + iters)
    cost = conv_cost(b, oh, oh, k, k, cin, cout, h, h,
                     out_bytes=1 if requant else 2)
    chip = detect_chip()
    tops = cost.flops / t / 1e12
    return dict(
        layer, oh=oh, time_us=round(t * 1e6, 2), tops=round(tops, 1),
        roofline_pct=round(roofline_pct(t, cost, chip), 1),
        flops=cost.flops,
    )


def run_resnet50_sweep(batch: int = 32, out_path: Optional[str] = None
                       ) -> List[Dict[str, Any]]:
    results = []
    for layer in resnet50_conv_layers(batch):
        r = bench_conv_layer(layer)
        results.append(r)
        print(f"{r['name']:>10} {r['h']:>3}x{r['h']:<3} {r['cin']:>4}->"
              f"{r['cout']:<4} k{r['k']} s{r['stride']}: {r['time_us']:>8}us "
              f"{r['tops']:>6} TOPS  {r['roofline_pct']:>5}% SOL  x{r['count']}")
    total_us = sum(r["time_us"] * r["count"] for r in results)
    total_flops = sum(r["flops"] * r["count"] for r in results)
    print(f"sum of conv layers: {total_us:.0f}us, "
          f"{total_flops / (total_us * 1e-6) / 1e12:.0f} TOPS effective")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results
