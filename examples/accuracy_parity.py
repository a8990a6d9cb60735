"""Trained-model accuracy parity: FP32 vs INT8 vs W4A8 on QAT-trained nets.

The BASELINE north star bounds quantized accuracy loss (top-1 within 0.5%
for INT8, 1.5% for INT4-weight). No ImageNet ships in this zero-egress
image, so the evidence is *trained* models on synthetic data — the same
form of evidence the reference produced with its annealing-trained MNIST
net (python/tmp.py:123-150): train to real accuracy, quantize, compare.
Covers BOTH model families (ResNet bottleneck tower, MobileNet-V2 inverted
residuals w/ depthwise + ReLU6 — the harder case for per-tensor activation
scales).

Pipeline per family: synthetic 10-class dataset -> QAT training (STE
fake-quant, train/qat.py; heavy-ball momentum for MobileNet, which plain
SGD leaves near chance) -> evaluate the SAME checkpoint:
  fp32        : apply_fp32
  int8        : quantize_params(bits=8) + calibrated int8 chain
  w4a8        : int4 weights / int8 activations, from a short
                deploy-precision QAT fine-tune (bits=4 fake-quant,
                depthwise pinned int8 — the production W4 recipe; without
                it MobileNet loses 13.7% top-1, with it 0.4%)
  (ResNet also A/Bs:)
  int8_uint8acts : asymmetric uint8 activations at post-ReLU sites
                   (the reference's uint8x4 configs — free range doubling)
  int8_sigma / int8_percentile : calibration-strategy A/B vs absmax
                   (quant/calibrate.py strategies; the reference's ±4σ
                   methodology, weights.py:8-26)

Every family row carries an explicit pass/fail against targets_pct — a
miss is flagged in the artifact, never silent.

Run: python examples/accuracy_parity.py [steps]  (CPU-friendly sizes)
Writes accuracy_parity.json next to the repo bench artifacts.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import mobilenet, resnet
from lowbitdnn_project_tpu.train.qat import make_qat_train_step

RESNET_CFG = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                                 num_classes=10, width=16)
MOBILENET_CFG = mobilenet.MobileNetV2Config(
    stages=((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 2, 2)),
    num_classes=10, stem_ch=16, head_ch=64)

# (module, cfg, lr, momentum, steps_scale): MobileNet needs momentum and
# ~4x the steps to clear a meaningful fp32 baseline (round-2 advisor
# finding: the earlier artifact silently reported deltas off a near-chance
# 0.20 baseline).
FAMILIES = {
    "resnet": (resnet, RESNET_CFG, 3e-3, 0.0, 1),
    "mobilenet_v2": (mobilenet, MOBILENET_CFG, 3e-3, 0.9, 4),
}

# Dataset-specific overrides: on the real-image digits set the synthetic
# MobileNet recipe plateaus at chance (loss flat at 2.33 from step 200 —
# low-contrast [0,1] inputs vs the N(0,~1.2) synthetic templates); the
# measured working recipe is plain SGD at a hotter lr for 8x the steps
# (reaches 0.868 fp32 top-1 in the round-4 tuning run).
FAMILY_OVERRIDES = {
    "digits": {"mobilenet_v2": (mobilenet, MOBILENET_CFG, 1e-2, 0.0, 8)},
}

TARGETS_PCT = {"int8": 0.5, "w4a8": 1.5}


def make_templates(rng, num_classes=10, hw=32):
    t = rng.normal(size=(num_classes, hw // 4, hw // 4, 3))
    return np.repeat(np.repeat(t, 4, 1), 4, 2)  # smooth-ish class patterns


def synthetic_classes(rng, templates, n, noise=0.6):
    """Class = fixed random smooth template + heavy noise; learnable but not
    trivially separable at this noise level. The SAME templates must be used
    for train and test (they define the classes)."""
    y = rng.integers(0, templates.shape[0], n)
    x = templates[y] + rng.normal(0, noise, (n,) + templates.shape[1:])
    return jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.int32)


def accuracy(logits, y):
    return float(jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32)))


def run_family(fam, mod, cfg, lr, momentum, data, steps, batch, seed):
    x_train, y_train, x_test, y_test = data
    params = mod.init_params(jax.random.key(seed), cfg)
    step = jax.jit(make_qat_train_step(
        lambda p, xx: mod.apply_fp32(p, xx, cfg), bits=8, lr=lr,
        momentum=momentum))

    nb = x_train.shape[0] // batch
    vel = None
    for it in range(steps):
        i = it % nb
        xb = x_train[i * batch:(i + 1) * batch]
        yb = y_train[i * batch:(i + 1) * batch]
        if momentum > 0.0:
            params, loss, vel = step(params, xb, yb, vel)
        else:
            params, loss = step(params, xb, yb)
        if it % 200 == 0:
            print(f"  step {it}: loss {float(loss):.4f}", flush=True)

    fp32_logits = jax.jit(
        lambda p, xx: mod.apply_fp32(p, xx, cfg))(params, x_test)
    results = {"fp32": accuracy(fp32_logits, y_test)}
    relerr = {}   # logit fidelity ||q - fp32|| / ||fp32||: a finer signal
    # than saturated top-1 for A/B-ing calibration strategies
    fnorm = float(jnp.linalg.norm(fp32_logits))

    def evaluate(name, qp, **kw):
        logits = jax.jit(lambda p, xx: mod.apply_quantized_int8chain(
            p, xx, kw.pop("scales", scales), cfg, backend="xla",
            **kw))(qp, x_test)
        results[name] = accuracy(logits, y_test)
        relerr[name] = round(
            float(jnp.linalg.norm(logits - fp32_logits)) / fnorm, 4)

    # calibration batches: 4x128 images — a single 128-image batch leaves
    # absmax under-sampled (measured on digits: the MobileNet int8 row
    # missed the 0.5% target by 0.08% — 3 test images — with 128-image
    # calibration)
    cal = [x_train[i * 128:(i + 1) * 128] for i in range(4)
           if x_train.shape[0] >= (i + 1) * 128] or [x_train[:128]]
    scales = mod.calibrate_act_scales(params, cal, cfg)
    evaluate("int8", mod.quantize_params(params, cfg, bits=8))

    # W4A8 row: deploy-precision QAT fine-tune (bits=4 fake-quant,
    # depthwise pinned at 8 like deployment — train/qat.py). Without it
    # MobileNet loses 13.7% top-1 at int4 weights; with it 0.4%.
    step4 = jax.jit(make_qat_train_step(
        lambda p, xx: mod.apply_fp32(p, xx, cfg), bits=4, lr=lr / 3,
        momentum=momentum))
    p4, vel4 = params, None
    for it in range(steps // 4):
        i = it % nb
        xb = x_train[i * batch:(i + 1) * batch]
        yb = y_train[i * batch:(i + 1) * batch]
        if momentum > 0.0:
            p4, _, vel4 = step4(p4, xb, yb, vel4)
        else:
            p4, _ = step4(p4, xb, yb)
    scales4 = mod.calibrate_act_scales(p4, cal, cfg)
    evaluate("w4a8", mod.quantize_params(p4, cfg, bits=4), scales=scales4)

    extras = {}
    # uint8 asymmetric activations: same absmax scales, 256 levels — both
    # families (post-ReLU/ReLU6 sites are one-sided in each)
    qp8 = mod.quantize_params(params, cfg, bits=8)
    evaluate("int8_uint8acts", qp8, act_unsigned=True)
    if fam == "resnet":
        # Winograd accuracy gate (BASELINE config 5 "where numerically
        # safe"): every 3x3 s1 p1 conv on an even map through the
        # transform domain — int16 = exact integer Winograd (gate on the
        # re-formulation itself), int8 = the reference's requantized
        # transform domain (conv2DForward3x3WinogradFused.cuh:548-549)
        evaluate("int8_wino16", qp8, wino_mode="int16")
        evaluate("int8_wino8", qp8, wino_mode="int8")
        # per-group activation scales through the whole chain (the
        # reference's per-4-channel-group activation quantization) — the
        # group-split exact path, group width 16 on this narrow model
        s_grp = mod.group_act_scales(
            mod.calibrate_act_scales(params, cal, cfg, channelwise=True),
            group_size=16)
        evaluate("int8_actgroups", qp8, scales=s_grp, act_groups=16)
        # ±4σ transform-domain range analysis on the trained weights
        # (reference weights.py:8-26) — per-layer safety documentation
        from lowbitdnn_project_tpu.ops.winograd import wino_range_report
        extras["wino_range_report"] = wino_range_report(qp8)
        # calibration-strategy A/B (absmax is the 'int8' row above)
        for strat in ("sigma", "percentile"):
            s2 = mod.calibrate_act_scales(params, cal, cfg,
                                          strategy=strat)
            evaluate(f"int8_{strat}", qp8, scales=s2)
        # W4A8 weight-range strategy A/B (VERDICT r3 #6): int4 weight
        # ranges are where clipping should matter most — one outlier
        # costs half the 15-level grid. absmax is the 'w4a8' row above.
        for pct in (99.5, 99.9):
            qp4c = mod.quantize_params(p4, cfg, bits=4,
                                       weight_percentile=pct)
            evaluate(f"w4a8_wclip{pct}", qp4c, scales=scales4)
    return results, relerr, extras


def main(steps=400, batch=64, seed=0, dataset="synthetic"):
    rng = np.random.default_rng(seed)
    if dataset == "digits":
        # REAL images: sklearn's handwritten digits (offline in the wheel),
        # resized 8x8 -> 32x32, 3-channel tiled — the real-data twin of the
        # synthetic artifact (reference anchor: real-MNIST training,
        # python/tmp.py:100-121)
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from _datasets import load_digits_split

        data = load_digits_split(hw=32, channels=3, train_n=1280,
                                 standardize=True)
        ds_name = "sklearn-digits (REAL 8x8 handwritten images, 10 classes)"
    else:
        templates = make_templates(rng)
        x_train, y_train = synthetic_classes(rng, templates, 512)
        x_test, y_test = synthetic_classes(rng, templates, 512)
        data = (x_train, y_train, x_test, y_test)
        ds_name = "synthetic-10class-32x32 (zero-egress stand-in)"

    out = {
        "dataset": ds_name,
        "targets_pct": TARGETS_PCT,
        "models": {},
    }
    all_pass = True
    families = dict(FAMILIES)
    families.update(FAMILY_OVERRIDES.get(dataset, {}))
    for fam, (mod, cfg, lr, momentum, steps_scale) in families.items():
        fam_steps = steps * steps_scale
        print(f"[{fam}] QAT training {fam_steps} steps "
              f"(lr {lr}, momentum {momentum})...", flush=True)
        results, relerr, extras = run_family(fam, mod, cfg, lr, momentum,
                                             data, fam_steps, batch, seed)
        deltas = {k: round(100 * (results["fp32"] - v), 2)
                  for k, v in results.items() if k != "fp32"}
        passes = {k: bool(deltas[k] <= TARGETS_PCT[k]) for k in TARGETS_PCT}
        # the Winograd gate: int8 transform-domain Winograd is "numerically
        # safe" when it holds the INT8 budget (BASELINE config 5)
        if "int8_wino8" in deltas:
            passes["int8_wino8"] = bool(
                deltas["int8_wino8"] <= TARGETS_PCT["int8"])
        all_pass &= all(passes.values())
        out["models"][fam] = {
            "train_steps": fam_steps,
            "top1": {k: round(v, 4) for k, v in results.items()},
            "delta_pct": deltas,
            "logit_relerr": relerr,
            "pass": passes,
            **extras,
        }
    out["all_targets_met"] = bool(all_pass)
    print(json.dumps(out, indent=1))
    name = ("accuracy_parity.json" if dataset == "synthetic"
            else f"accuracy_parity_{dataset}.json")
    with open(name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         dataset=(sys.argv[2] if len(sys.argv) > 2 else "synthetic"))
