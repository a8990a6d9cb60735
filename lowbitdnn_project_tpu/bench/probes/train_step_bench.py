"""End-to-end train-step timing: QAT (STE fake-quant) vs the plain step.

The reference benchmarks training at per-op granularity only
(python/benchmark_backward.py — matched by bench_backward_r2.json's
backward_grid).  This probe adds the e2e number a user actually plans
capacity with: one full ResNet-50 SGD step (forward + backward + update)
under QAT fake-quantization vs the identical step without it, same dtype
config, chained device timing, interleaved min-of-2.

Output: train_step_bench_r3.json — step times, images/s, and the measured
QAT overhead (the STE fake-quant passes ride the same graph; their cost is
the honest price of training the deploy-precision network).

Run: python -m lowbitdnn_project_tpu.bench.probes.train_step_bench [batch]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                      # noqa: E402
from lowbitdnn_project_tpu.train.qat import (                        # noqa: E402
    cross_entropy, fake_quantize_tree)
from lowbitdnn_project_tpu.utils.timing import chained_device_time   # noqa: E402

CFG = resnet.RESNET50
LR = 1e-3


def main(batch=32):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    params = jax.jit(lambda: resnet.init_params(jax.random.key(0), CFG))()
    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5
    labels = jnp.zeros((batch,), jnp.int32)
    mark("built")

    def make_step(qat: bool):
        # x/labels go through args, NOT closure — closed-over arrays embed
        # as XLA constants and bloat the executable pushed over the relay
        def loss_fn(p, x, labels):
            q = fake_quantize_tree(p, bits=8) if qat else p
            return cross_entropy(resnet.apply_fp32(q, x, CFG), labels)

        def step(p, x, labels):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, labels)
            new = jax.tree_util.tree_map(
                lambda w, g: w - LR * g
                if jnp.issubdtype(w.dtype, jnp.inexact) else w, p, grads)
            # fold the loss into conv1 so the chained carry depends on the
            # WHOLE step (update included) — nothing gets sliced away
            new["conv1"] = new["conv1"] + loss * 1e-20
            return new

        return step

    best = {}
    for p in range(2):
        for name, qat in [("plain", False), ("qat", True)]:
            t = chained_device_time(make_step(qat), params, lo=3, hi=13,
                                    reps=3, args=(x, labels))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e3:8.2f} ms")

    out = {
        "batch": batch,
        "plain_step_ms": round(best["plain"] * 1e3, 2),
        "qat_step_ms": round(best["qat"] * 1e3, 2),
        "plain_img_s": round(batch / best["plain"], 1),
        "qat_img_s": round(batch / best["qat"], 1),
        "qat_overhead_pct": round(
            100.0 * (best["qat"] / best["plain"] - 1.0), 1),
    }
    print(json.dumps(out, indent=1))
    with open("train_step_bench_r3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
