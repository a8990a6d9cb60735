"""Driver benchmark: ResNet-50 INT8 inference images/s on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N}
vs_baseline = speedup over the bf16 XLA forward of the same model — the TPU
analogue of the reference's cuDNN-float-vs-int8 comparisons
(cpp/int8conv/check.cu:138-154).

Timing uses chained on-device fori_loop iterations with scalar fetch
(utils/timing.py) because host-side timing is unreliable through the relay.
"""
import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from lowbitdnn_project_tpu.models import resnet
    from lowbitdnn_project_tpu.utils.timing import (
        chain_via_scalar,
        chained_device_time,
    )

    cfg = resnet.RESNET50
    batch = 128
    params = jax.jit(lambda k: resnet.init_params(k, cfg))(jax.random.key(0))
    qparams = jax.jit(lambda p: resnet.quantize_params(p, cfg))(params)
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.float32)
    act_scales = resnet.calibrate_act_scales(params, [x[:8]], cfg)

    def int8_step(carry):
        logits = resnet.apply_quantized_int8chain(
            qparams, carry, act_scales, cfg, backend="xla")
        return chain_via_scalar(carry, logits)

    t_int8 = chained_device_time(int8_step, x, lo=5, hi=55)

    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    xb = x.astype(jnp.bfloat16)

    def bf16_step(carry):
        logits = resnet.apply_fp32(params_bf16, carry, cfg)
        return chain_via_scalar(carry, logits)

    t_bf16 = chained_device_time(bf16_step, xb, lo=5, hi=55)

    ips_int8 = batch / t_int8
    ips_bf16 = batch / t_bf16
    print(json.dumps({
        "metric": "resnet50_int8_images_per_sec_per_chip",
        "value": round(ips_int8, 2),
        "unit": "images/s",
        "vs_baseline": round(ips_int8 / ips_bf16, 3),
    }))


if __name__ == "__main__":
    main()
