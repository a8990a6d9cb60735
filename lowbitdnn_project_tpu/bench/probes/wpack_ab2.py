"""Bisect the e2e wpack loss: stem backend x wpack, one-block routing."""
import sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

cfg = resnet.RESNET50
params = resnet.init_params(jax.random.key(0), cfg)
qparams = resnet.quantize_params(params, cfg)
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3))
scales = resnet.calibrate_act_scales(params, [x[:4]], cfg)

def mkstep(uw, stem):
    def step(carry, qp, sc):
        logits = resnet.apply_quantized_int8chain(
            qp, carry, sc, cfg, use_wpack=uw, stem_backend=stem)
        return chain_via_scalar(carry, logits)
    return step

variants = {
    "classic/fused": (False, "fused"),
    "wpack/fused": (True, "fused"),
    "classic/classic": (False, "classic"),
    "wpack/classic": (True, "classic"),
}
best = {}
for _ in range(2):
    for name, (uw, stem) in variants.items():
        t = chained_device_time(mkstep(uw, stem), x, lo=20, hi=220,
                                args=(qparams, scales))
        best[name] = min(best.get(name, 1e9), t)
for name, t in best.items():
    print(f"b{batch} {name:16s}: {t*1e6:9.1f} us  {batch/t:9.0f} img/s")
