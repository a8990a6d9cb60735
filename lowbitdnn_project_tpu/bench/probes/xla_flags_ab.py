"""XLA TPU compile-option A/B on the headline chain (b32, fused stem).

The one compiler surface never probed: libtpu/XLA backend options. Passing
them via XLA_FLAGS fails on this stack — the CLIENT-side flag parser
aborts on libtpu-only names (``Unknown flag in XLA_FLAGS:
--xla_tpu_scoped_vmem_limit_kib``, measured) because the axon relay client
binary doesn't link the TPU compiler's flag registry. The working route is
per-executable ``jax.jit(compiler_options=...)`` -> PJRT
env_option_overrides, resolved by the server-side compiler.

That also upgrades the experiment: all variants run interleaved in ONE
process (relay clock drift >10%/minutes cancels; per-variant max-img/s
over passes), vs the subprocess-per-flag design the XLA_FLAGS route forced.

Candidate: scoped VMEM limit (how much VMEM fusions may assume; more can
deepen conv pipelining, too much fails compiles — v5e hard limit 16 MB).
Latency-hiding-scheduler / async-collective options are multi-chip-only.

Run: python -m lowbitdnn_project_tpu.bench.probes.xla_flags_ab
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.models import resnet                     # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                    # noqa: E402
    chain_via_scalar, chained_device_time)

VARIANTS = [
    ("baseline", None),
    ("vmem4m", {"xla_tpu_scoped_vmem_limit_kib": "4096"}),
    ("vmem8m", {"xla_tpu_scoped_vmem_limit_kib": "8192"}),
    ("vmem12m", {"xla_tpu_scoped_vmem_limit_kib": "12288"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]
# Measured (xla_flags_ab_r5.json): vmem8m/12m/lhs within relay noise of
# baseline, vmem4m -10% (the default scoped-vmem limit is already >4 MB
# and well-placed); unknown option names are rejected cleanly server-side
# ("No such compile option"). Surface closed: XLA defaults are optimal
# for the single-chip chain.


def main():
    t0 = time.perf_counter()
    cfg = resnet.RESNET50

    @jax.jit
    def build():
        params = resnet.init_params(jax.random.key(0), cfg)
        qparams = resnet.quantize_params(params, cfg)
        x = jax.random.normal(jax.random.key(1), (32, 224, 224, 3),
                              jnp.float32)
        return qparams, x

    qparams, x = build()
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    with open(os.path.join(root, "bench_cache.json")) as f:
        act_scales = {k: jnp.asarray(v, jnp.float32)
                      for k, v in json.load(f)["act_scales"].items()}

    def step(c, qp, scales):
        logits = resnet.apply_quantized_int8chain(
            qp, c, scales, cfg, backend="xla")
        return chain_via_scalar(c, logits)

    best = {}
    failed = {}
    for _pass in range(3):
        for name, opts in VARIANTS:
            if name in failed:
                continue
            try:
                t = chained_device_time(step, x, lo=10, hi=110, reps=3,
                                        args=(qparams, act_scales),
                                        compiler_options=opts)
            except Exception as e:  # compile rejection of an option value
                failed[name] = repr(e)[-300:]
                print(f"[+{time.perf_counter()-t0:6.1f}s] {name}: FAILED "
                      f"{failed[name]}", flush=True)
                continue
            best[name] = max(best.get(name, 0.0), 32 / t)
            print(f"[+{time.perf_counter()-t0:6.1f}s] pass{_pass} {name}: "
                  f"{t*1e6:.1f} us = {32/t:.0f} img/s", flush=True)

    rows = [{"variant": n, "options": o,
             **({"img_s": round(best[n], 0)} if n in best
                else {"error": failed.get(n, "n/a")})}
            for n, o in VARIANTS]
    with open(os.path.join(root, "xla_flags_ab_r5.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(rows)


if __name__ == "__main__":
    main()
