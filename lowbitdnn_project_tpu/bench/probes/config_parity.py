"""One consolidated artifact for the five BASELINE.json tracked configs.

The evidence for the five configs was scattered across BENCH_NOTES /
accuracy artifacts (VERDICT r4 #8); this probe measures all five fresh in
one run on the chip and embeds the accuracy pointers from the committed
accuracy artifacts:

  1 single INT8 3x3 conv layer (per-channel scales) — us/TOPS/%roofline,
    vs bf16 same shape, on-device integer exactness vs the int32 oracle
  2 ResNet-18 end-to-end INT8 — img/s
  3 ResNet-50 INT8 fused-epilogue chain (shipped flagship routing) — img/s
    + vs bf16 (bench_cache baseline)
  4 MobileNet-V2 INT8 depthwise+pointwise — img/s + vs bf16
  5 ResNet-50 W4A8 (INT4 weights) — img/s; Winograd INT8 gate from
    accuracy_parity.json (int8_wino8 row + the ±4σ range report)

Run: python -m lowbitdnn_project_tpu.bench.probes.config_parity
Writes config_parity_r5.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import mobilenet, resnet            # noqa: E402
from lowbitdnn_project_tpu.ops.conv import conv2d_int32               # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

PEAK_INT8_TOPS = 394e12     # nominal v5e


def _mark(t0, m):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def config1_single_conv(t0):
    """b32 28x28 C=K=128 3x3 s1 p1 (a ResNet-50 body conv class)."""
    b, h, c, k = 32, 28, 128, 128
    key = jax.random.key(0)
    x = jax.random.randint(key, (b, h, h, c), -10, 10, jnp.int8)
    w = jax.random.randint(jax.random.key(1), (3, 3, c, k), -10, 10,
                           jnp.int8)
    # exactness: int8 conv int32 accumulation vs the float conv on
    # integer-valued inputs (the reference's check.cu strategy, on device)
    acc = conv2d_int32(x, w, (1, 1), (1, 1))
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    exact = bool(jnp.array_equal(acc.astype(jnp.float32), ref))
    _mark(t0, f"config1 exactness {exact}")

    scale = jnp.full((k,), 0.01, jnp.float32)   # per-channel epilogue

    def step_int8(cr):
        a = conv2d_int32(cr, w, (1, 1), (1, 1))
        out = a.astype(jnp.float32) * scale
        q = jnp.clip(jnp.round(out * 2.0), -127, 127).astype(jnp.int8)
        return chain_via_scalar(cr, q)

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def step_bf16(cr):
        out = jax.lax.conv_general_dilated(
            cr, wb, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return chain_via_scalar(cr, out)

    # iteration floors per CLAUDE.md: deltas under ~100 ms measure relay
    # jitter — a ~12 us conv needs hi~10000 (the first run's hi=2200
    # returned 0.0 us)
    t_i8 = chained_device_time(step_int8, x, lo=1000, hi=11000)
    t_bf = chained_device_time(step_bf16, xb, lo=300, hi=3300)
    macs = b * h * h * k * 9 * c
    tops = 2 * macs / t_i8 / 1e12
    return {
        "shape": f"b{b} {h}x{h} {c}->{k} 3x3 s1 p1 (+fused requant)",
        "int8_us": round(t_i8 * 1e6, 2), "bf16_us": round(t_bf * 1e6, 2),
        "int8_tops": round(tops, 1),
        "pct_roofline": round(100 * 2 * macs / t_i8 / PEAK_INT8_TOPS, 1),
        "vs_bf16": round(t_bf / t_i8, 3),
        "int32_exact_vs_float_oracle": exact,
    }


def _model_ips(t0, name, mod, cfg, batch, with_bf16=True, bits=8):
    @jax.jit
    def build():
        params = mod.init_params(jax.random.key(0), cfg)
        qp = mod.quantize_params(params, cfg, bits=bits)
        x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                              jnp.float32)
        return params, qp, x

    params, qp, x = build()
    scales = mod.calibrate_act_scales(params, [x[:8]], cfg)

    def step_q(cr, qp, s):
        logits = mod.apply_quantized_int8chain(qp, cr, s, cfg,
                                               backend="xla")
        return chain_via_scalar(cr, logits)

    t_q = chained_device_time(step_q, x, lo=10, hi=110, args=(qp, scales))
    _mark(t0, f"{name} int{bits}: {batch / t_q:.0f} img/s")
    row = {"img_s": round(batch / t_q, 1), "batch": batch}
    if with_bf16:
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)

        def step_b(cr, pb):
            return chain_via_scalar(cr, mod.apply_fp32(pb, cr, cfg))

        t_b = chained_device_time(step_b, x.astype(jnp.bfloat16), lo=10,
                                  hi=110, args=(pb,))
        row["bf16_img_s"] = round(batch / t_b, 1)
        row["vs_bf16"] = round(t_b / t_q, 3)
        _mark(t0, f"{name} bf16: {batch / t_b:.0f} img/s")
    return row


def main():
    t0 = time.perf_counter()
    out = {"configs": {}}

    out["configs"]["1_single_int8_3x3_conv"] = config1_single_conv(t0)

    out["configs"]["2_resnet18_e2e_int8"] = _model_ips(
        t0, "rn18", resnet, resnet.RESNET18, 128, with_bf16=True)

    rn50 = _model_ips(t0, "rn50", resnet, resnet.RESNET50, 128,
                      with_bf16=True)
    rn50["note"] = ("fused requantize+bias+ReLU epilogues via the XLA conv "
                    "emitters (measured faster than the Pallas im2col-GEMM "
                    "insertion e2e — five probe-vs-e2e mis-ranks, "
                    "BENCH_NOTES); bench.py headline uses the b32 fused-"
                    "stem routing")
    out["configs"]["3_resnet50_int8_fused_epilogue"] = rn50

    out["configs"]["4_mobilenet_v2_int8"] = _model_ips(
        t0, "mnv2", mobilenet, mobilenet.MOBILENET_V2, 128, with_bf16=True)

    w4 = _model_ips(t0, "rn50_w4a8", resnet, resnet.RESNET50, 128,
                    with_bf16=False, bits=4)
    try:
        with open("/root/repo/accuracy_parity.json") as f:
            acc = json.load(f)["models"]["resnet"]
        w4["accuracy"] = {
            "w4a8_top1_delta_pct": acc["delta_pct"]["w4a8"],
            "wino_int8_top1_delta_pct": acc["delta_pct"]["int8_wino8"],
            "wino_int8_pass": acc["pass"]["int8_wino8"],
            "wino_range_report": acc.get("wino_range_report"),
            "source": "accuracy_parity.json",
        }
    except (OSError, KeyError) as e:
        w4["accuracy"] = {"error": str(e)}
    out["configs"]["5_resnet50_w4a8_plus_winograd"] = w4

    out["sources"] = {
        "accuracy": ["accuracy_parity.json", "accuracy_parity_digits.json",
                     "digits_seed_stability_r4.json"],
        "per_layer_roofline": "bench_results_r4_wide.json",
        "serving": "resident_ktile_ab_r5.json",
    }
    print(json.dumps(out, indent=1))
    with open("config_parity_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
