"""Seed stability of the quantization delta on real data (MobileNet-V2).

The digits artifact's MobileNet int8 row sits AT the 0.5% top-1 target:
0.58% = 3 images of the 517-image test split (granularity 0.19%/image),
and doubling calibration data did not move it — so the question is whether
the miss is quantization damage or single-checkpoint noise. This probe
answers it the honest way: train N independently-seeded checkpoints with
the same recipe and report the per-seed deltas plus their mean/spread,
instead of re-rolling seeds until one passes.

Reference anchor: the reference's accuracy evidence is likewise a single
trained run (python/tmp.py:123-150); per-seed spread is evidence the
reference never produced.

Run: python examples/digits_seed_stability.py [n_seeds]
Writes digits_seed_stability_r4.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import accuracy_parity as ap  # noqa: E402
from _datasets import load_digits_split  # noqa: E402


def main(n_seeds=3):
    data = load_digits_split(hw=32, channels=3, train_n=1280,
                             standardize=True)
    mod, cfg, lr, momentum, steps_scale = ap.FAMILY_OVERRIDES["digits"][
        "mobilenet_v2"]
    steps = 400 * steps_scale

    rows = []
    for seed in range(n_seeds):
        print(f"[seed {seed}] training {steps} steps...", flush=True)
        results, relerr = ap.run_family("mobilenet_v2", mod, cfg, lr,
                                        momentum, data, steps, 64, seed)
        deltas = {k: round(100 * (results["fp32"] - v), 2)
                  for k, v in results.items() if k != "fp32"}
        rows.append({"seed": seed,
                     "top1": {k: round(v, 4) for k, v in results.items()},
                     "delta_pct": deltas,
                     "logit_relerr": relerr})
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "dataset": "sklearn-digits (REAL images; 517-image test split, "
                   "top-1 granularity 0.193%/image)",
        "model": "mobilenet_v2 (digits recipe: SGD lr 1e-2, "
                 f"{steps} steps)",
        "targets_pct": ap.TARGETS_PCT,
        "per_seed": rows,
        "delta_mean_pct": {
            k: round(float(np.mean([r["delta_pct"][k] for r in rows])), 3)
            for k in ("int8", "w4a8")},
        "delta_range_pct": {
            k: [min(r["delta_pct"][k] for r in rows),
                max(r["delta_pct"][k] for r in rows)]
            for k in ("int8", "w4a8")},
    }
    out["mean_targets_met"] = bool(all(
        out["delta_mean_pct"][k] <= ap.TARGETS_PCT[k]
        for k in ("int8", "w4a8")))
    print(json.dumps(out, indent=1))
    with open("digits_seed_stability_r4.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
