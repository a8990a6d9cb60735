"""Seed stability of the int8 transform-domain Winograd gate on real data.

The r5 digits refresh caught the gate's first empirical miss: one trained
ResNet checkpoint put `int8_wino8` at Δ 0.77% top-1 (4 of 517 images,
granularity 0.193%/image) vs Δ 0.0% on synthetic, while the int16
transform mode stayed at plain-int8 accuracy. Same honesty question as
the MobileNet int8 row in round 4 (digits_seed_stability_r4.json): is
0.77% transform-domain quantization damage, or single-checkpoint noise?
Answer it the same way — N independently-seeded checkpoints with the
identical recipe, per-seed deltas + mean/spread reported, no re-rolling.

Reference anchor: the reference justified int8 Winograd with a weight
range analysis (weights.py:8-26) but never measured the trained-model
cost; the gate + this spread is that missing measurement.

Run: python examples/wino_seed_stability.py [n_seeds]
Writes wino_seed_stability_r5.json.
"""
import json
import os
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import accuracy_parity as ap  # noqa: E402
from _datasets import load_digits_split  # noqa: E402

from lowbitdnn_project_tpu.train.qat import make_qat_train_step  # noqa: E402


def main(n_seeds=3):
    x_train, y_train, x_test, y_test = load_digits_split(
        hw=32, channels=3, train_n=1280, standardize=True)
    mod, cfg, lr, momentum, _ = ap.FAMILIES["resnet"]
    steps, batch = 400, 64

    rows = []
    for seed in range(n_seeds):
        print(f"[seed {seed}] QAT {steps} steps (lr {lr})...", flush=True)
        params = mod.init_params(jax.random.key(seed), cfg)
        step = jax.jit(make_qat_train_step(
            lambda p, xx: mod.apply_fp32(p, xx, cfg), bits=8, lr=lr,
            momentum=momentum))
        nb = x_train.shape[0] // batch
        for it in range(steps):
            i = it % nb
            params, loss = step(params, x_train[i * batch:(i + 1) * batch],
                                y_train[i * batch:(i + 1) * batch])

        fp32_logits = jax.jit(
            lambda p, xx: mod.apply_fp32(p, xx, cfg))(params, x_test)
        top1 = {"fp32": ap.accuracy(fp32_logits, y_test)}
        cal = [x_train[i * 128:(i + 1) * 128] for i in range(4)]
        scales = mod.calibrate_act_scales(params, cal, cfg)
        qp8 = mod.quantize_params(params, cfg, bits=8)
        for name, kw in (("int8", {}),
                         ("int8_wino16", {"wino_mode": "int16"}),
                         ("int8_wino8", {"wino_mode": "int8"})):
            logits = jax.jit(lambda p, xx, kw=kw: mod.apply_quantized_int8chain(
                p, xx, scales, cfg, backend="xla", **kw))(qp8, x_test)
            top1[name] = ap.accuracy(logits, y_test)
        deltas = {k: round(100 * (top1["fp32"] - v), 2)
                  for k, v in top1.items() if k != "fp32"}
        # the gate's own increment: what the int8 TRANSFORM DOMAIN costs
        # on top of plain int8 quantization
        deltas["wino8_minus_int8"] = round(
            deltas["int8_wino8"] - deltas["int8"], 2)
        rows.append({"seed": seed,
                     "top1": {k: round(v, 4) for k, v in top1.items()},
                     "delta_pct": deltas})
        print(json.dumps(rows[-1]), flush=True)

    keys = ("int8", "int8_wino16", "int8_wino8", "wino8_minus_int8")
    out = {
        "dataset": "sklearn-digits (REAL images; 517-image test split, "
                   "top-1 granularity 0.193%/image)",
        "model": f"resnet narrow (digits recipe: SGD lr {lr}, {steps} steps)",
        "int8_budget_pct": ap.TARGETS_PCT["int8"],
        "per_seed": rows,
        "delta_mean_pct": {
            k: round(float(np.mean([r["delta_pct"][k] for r in rows])), 3)
            for k in keys},
        "delta_range_pct": {
            k: [min(r["delta_pct"][k] for r in rows),
                max(r["delta_pct"][k] for r in rows)] for k in keys},
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "wino_seed_stability_r5.json"),
            "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
