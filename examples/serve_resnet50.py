"""End-to-end INT8 serving example: native host preprocessing -> calibrated
int8-chained ResNet-50 -> logits; optionally saves/loads the quantized
checkpoint. The full deployment flow a reference user would assemble from
qtorch + cuDNN, on TPU.

Run: python examples/serve_resnet50.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.runtime import preprocess_quantize
from lowbitdnn_project_tpu.utils import load_quantized, save_quantized

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def main():
    cfg = resnet.RESNET50
    print("building model (random weights; use "
          "models.convert.resnet_from_torch_state_dict for a real ckpt)...")
    params = jax.jit(lambda k: resnet.init_params(k, cfg))(jax.random.key(0))
    qparams = jax.jit(lambda p: resnet.quantize_params(p, cfg))(params)

    # calibrate on a handful of batches
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(size=(8, 224, 224, 3)), jnp.float32)
    scales = resnet.calibrate_act_scales(params, [calib], cfg)

    save_quantized("/tmp/resnet50_int8.lbq", {"qparams": qparams,
                                              "act_scales": scales})
    loaded = load_quantized("/tmp/resnet50_int8.lbq")
    qparams, scales = loaded["qparams"], loaded["act_scales"]
    print("checkpoint round-tripped: /tmp/resnet50_int8.lbq")

    infer = jax.jit(lambda p, x: resnet.apply_quantized_int8chain(
        p, x, scales, cfg, backend="xla"))

    # host-side native pipeline: uint8 images -> normalized int8 NHWC
    raw = rng.integers(0, 256, (32, 224, 224, 3)).astype(np.uint8)
    in_scale = float(scales["conv1"])
    t0 = time.perf_counter()
    x_int8 = preprocess_quantize(raw, IMAGENET_MEAN, IMAGENET_STD, in_scale)
    t1 = time.perf_counter()
    # the int8-chain entry quantizes floats itself; feed dequantized-normalized
    x = jnp.asarray(x_int8, jnp.float32) * in_scale
    logits = infer(qparams, x)
    top1 = np.asarray(jnp.argmax(logits, -1))
    print(f"host preprocess: {1000 * (t1 - t0):.1f} ms for 32 imgs "
          f"(C++ OpenMP)")
    print(f"logits {logits.shape}, top-1 of first 8: {top1[:8]}")


if __name__ == "__main__":
    main()
