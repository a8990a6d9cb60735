"""Driver benchmark: ResNet-50 INT8 inference images/s on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N}
vs_baseline = speedup over the bf16 XLA forward of the same model — the TPU
analogue of the reference's cuDNN-float-vs-int8 comparisons
(cpp/int8conv/check.cu:138-154).

Timing uses chained on-device fori_loop iterations with scalar fetch
(utils/timing.py) because host-side timing is unreliable through the relay.

Cold-start economics: full-model compiles take minutes through this
environment's remote-compile path, so (a) params are built on the CPU
backend (no TPU compile), (b) calibration scales and the bf16 baseline are
cached in bench_cache.json (committed; deterministic params from a fixed
seed) — a cold run only compiles the int8 inference loop. Delete the cache
file to force full re-measurement.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _mark(msg):
    # phase timestamps on stderr: visible when run by hand, invisible to the
    # driver's JSON-line parse (stdout)
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_cache.json")
# Best measured throughput config (interleaved batch scan, r2): batch 32
# with the fused Pallas stem beats b128-classic 22.3k vs 21.6k img/s, and
# bf16's own best batch is also 32 (14.1k) -> ratio compares best-vs-best.
BATCH = 32


def build_model():
    """Build params + input ON DEVICE inside one jit: no host->device
    weight transfer (the relay moves data at KB/s; a 100 MB device_put of
    ResNet-50 params dominates wall clock), and the init executable is
    small + persistent-cacheable."""
    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.RESNET50

    @jax.jit
    def build():
        params = resnet.init_params(jax.random.key(0), cfg)
        qparams = resnet.quantize_params(params, cfg)
        x = jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3),
                              jnp.float32)
        return params, qparams, x

    return (cfg, *build())


def main():
    from lowbitdnn_project_tpu.models import resnet
    from lowbitdnn_project_tpu.utils.timing import (
        chain_via_scalar,
        chained_device_time,
    )

    _mark("imports done")
    cfg, params, qparams, x = build_model()
    _mark("model built")

    cache = {}
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            cache = json.load(f)

    if "act_scales" in cache:
        act_scales = {k: jnp.asarray(v, jnp.float32)
                      for k, v in cache["act_scales"].items()}
    else:
        act_scales = resnet.calibrate_act_scales(params, [x[:8]], cfg)
        cache["act_scales"] = {k: float(v) for k, v in act_scales.items()}

    # qparams/act_scales as jit ARGS, not closure constants: closed-over
    # weights get embedded in the executable (98 MB measured round 1) and
    # pushed through the relay on every cold run.
    def int8_step(carry, qparams, act_scales):
        logits = resnet.apply_quantized_int8chain(
            qparams, carry, act_scales, cfg, backend="xla")
        return chain_via_scalar(carry, logits)

    _mark("calibration ready")
    t_int8 = chained_device_time(int8_step, x, lo=10, hi=110,
                                 args=(qparams, act_scales))
    ips_int8 = BATCH / t_int8
    _mark("int8 measured")

    if f"bf16_img_s_b{BATCH}" in cache:
        ips_bf16 = float(cache[f"bf16_img_s_b{BATCH}"])
    else:
        params_bf16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        xb = x.astype(jnp.bfloat16)

        def bf16_step(carry, params_bf16):
            logits = resnet.apply_fp32(params_bf16, carry, cfg)
            return chain_via_scalar(carry, logits)

        ips_bf16 = BATCH / chained_device_time(bf16_step, xb, lo=10, hi=110,
                                               args=(params_bf16,))
        cache[f"bf16_img_s_b{BATCH}"] = round(ips_bf16, 2)

    try:
        with open(_CACHE, "w") as f:
            json.dump(cache, f)
    except OSError:
        pass

    print(json.dumps({
        "metric": "resnet50_int8_images_per_sec_per_chip",
        "value": round(ips_int8, 2),
        "unit": "images/s",
        "vs_baseline": round(ips_int8 / ips_bf16, 3),
    }))


if __name__ == "__main__":
    main()
