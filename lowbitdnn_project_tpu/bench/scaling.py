"""Images/s scaling benchmark across a device mesh (DP x TP).

BASELINE north star: ">=85% linear images/s scaling to 2 hosts at INT8".
This environment exposes ONE physical TPU chip, so real multi-chip numbers
cannot be produced here; this module is the measurement harness for when a
pod slice is attached (it also runs on the virtual CPU mesh to validate the
sharded program end-to-end, where absolute numbers are meaningless but the
scaling *machinery* — sharded inputs, TP-sharded weights, XLA collectives —
is exercised for real).

Usage: python -m lowbitdnn_project_tpu.bench.scaling [--tp 1] [--batch-per-device 16]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def measure_images_per_sec(n_devices: int, tp: int = 1,
                           batch_per_device: int = 16,
                           image: int = 224, tiny: bool = False):
    from lowbitdnn_project_tpu.models import resnet
    from lowbitdnn_project_tpu.parallel import (
        make_mesh, shard_batch, shard_qparams_tp, replicate_qparams)
    from lowbitdnn_project_tpu.utils.timing import (
        chain_via_scalar, chained_device_time)

    cfg = (resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                               num_classes=16, width=16) if tiny
           else resnet.RESNET50)
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(dp=n_devices // tp, tp=tp, devices=devices)
    params = jax.jit(lambda k: resnet.init_params(k, cfg))(jax.random.key(0))
    qparams = jax.jit(lambda p: resnet.quantize_params(p, cfg))(params)
    batch = batch_per_device * (n_devices // tp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, image, image, 3)), jnp.float32)
    scales = resnet.calibrate_act_scales(params, [x[:4]], cfg)

    with jax.set_mesh(mesh):
        qparams_s = (shard_qparams_tp(qparams, mesh) if tp > 1
                     else replicate_qparams(qparams, mesh))
        x_s = shard_batch(x, mesh)

        def step(c):
            logits = resnet.apply_quantized_int8chain(
                qparams_s, c, scales, cfg, backend="xla")
            return chain_via_scalar(c, logits)

        t = chained_device_time(step, x_s, lo=3, hi=13)
    return batch / t


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--batch-per-device", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + 64px (CPU-mesh validation)")
    args = ap.parse_args(argv)

    n_all = len(jax.devices())
    results = {}
    n = 1
    while n <= n_all:
        if n % args.tp == 0:
            ips = measure_images_per_sec(
                n, args.tp, args.batch_per_device,
                image=64 if args.tiny else 224, tiny=args.tiny)
            results[n] = round(ips, 1)
            base = results[min(results)]
            lin = ips / (base * n / min(results))
            print(f"{n} devices (tp={args.tp}): {ips:.0f} img/s "
                  f"({100 * lin:.0f}% of linear)")
        n *= 2
    print(json.dumps({"scaling_img_s": results, "tp": args.tp,
                      "devices_available": n_all}))


if __name__ == "__main__":
    main()
