"""b2-b8 serving A/B: classic chain vs partial-resident regions.

The full resident chain is VMEM-bound to b1 (layer1's folded maps +
accumulators exceed VMEM at b>=4); pallas_tax says the XLA->pallas entry
tax is paid ONCE per region. So at b4/b8 a layer2->layer4 (or
layer3->layer4) resident region that pays one tax competes against the
classic chain's per-op dispatch costs across ~30 deep-stage ops.

Variants per batch: classic, partial start_stage=1 (layer2+ resident),
partial start_stage=2 (layer3+ resident). VMEM may reject start=1 at b8 —
caught and reported as "oom".

Run: python -m lowbitdnn_project_tpu.bench.probes.partial_resident_ab [batches...]
Writes partial_resident_ab_r4.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                       # noqa: E402
from lowbitdnn_project_tpu.kernels.resident_chain import (            # noqa: E402
    apply_serving_partial_resident, merge_pack, pack_resident_chain,
    split_pack)
from lowbitdnn_project_tpu.utils.timing import (                      # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def main(batches=(4, 8)):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    qp8 = jax.jit(lambda: resnet.quantize_params(
        resnet.init_params(jax.random.key(0), CFG), CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    arrs, statics = split_pack(pack_resident_chain(qp8, scales, CFG))
    mark("built + packed")

    results = []
    for batch in batches:
        x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5

        def step_classic(c, qp, s, a):
            out = resnet.apply_quantized_int8chain(qp, c, s, CFG,
                                                   backend="xla")
            return chain_via_scalar(c, out)

        def mk_partial(start):
            def step(c, qp, s, a):
                out = apply_serving_partial_resident(
                    qp, c, s, CFG, merge_pack(a, statics),
                    start_stage=start)
                return chain_via_scalar(c, out)
            return step

        variants = {"classic": step_classic,
                    "partial_l2": mk_partial(1),
                    "partial_l3": mk_partial(2)}

        # device correctness first (also surfaces VMEM OOM per variant)
        ok = {}
        lc = jax.jit(lambda qp, s, a: resnet.apply_quantized_int8chain(
            qp, x, s, CFG, backend="xla"))(qp8, scales, arrs)
        for name, start in (("partial_l2", 1), ("partial_l3", 2)):
            try:
                lr = jax.jit(
                    lambda qp, s, a, st=start: apply_serving_partial_resident(
                        qp, x, s, CFG, merge_pack(a, statics),
                        start_stage=st))(qp8, scales, arrs)
                agree = bool((jnp.argmax(lc, -1) == jnp.argmax(lr, -1)).all())
                ok[name] = agree
                mark(f"b{batch} {name}: argmax agree {agree}")
            except Exception as e:  # noqa: BLE001 — VMEM OOM reported per-variant
                ok[name] = f"error: {str(e)[:120]}"
                mark(f"b{batch} {name}: {str(e)[:120]}")

        # iter counts sized for ~250-500 us steps at b4/b8
        lo, hi = (150, 1200) if batch >= 4 else (200, 1700)
        best = {}
        for p in range(2):
            for name, fn in variants.items():
                if name != "classic" and not ok.get(name) is True:
                    continue
                t = chained_device_time(fn, x, lo=lo, hi=hi, reps=3,
                                        args=(qp8, scales, arrs))
                best[name] = min(best.get(name, t), t)
                mark(f"b{batch} {name} pass{p}: {t * 1e6:8.1f} us")

        us = {k: round(v * 1e6, 1) for k, v in best.items()}
        row = {"batch": batch, "us": us, "ok": ok}
        for name in ("partial_l2", "partial_l3"):
            if name in us:
                row[f"{name}_vs_classic"] = round(
                    us["classic"] / us[name], 3)
        results.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open("partial_resident_ab_r4.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (4, 8))
