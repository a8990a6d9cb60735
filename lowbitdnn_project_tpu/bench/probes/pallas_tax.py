"""The XLA->Pallas operand-handoff tax at batch 1, measured with an
identity kernel.

Round-3 investigation of why the VMEM-resident stage kernels (14-19 us per
stage, at their compute/weight floors standalone) LOSE 3x when routed into
the serving chain (stage_resident_ab_r3.json). Findings (this probe's
output, pallas_tax_r3.json):

  1. ds_only        — one classic XLA bottleneck block: ~5 us.
  2. ds_plus_ident  — same block + a PASS-THROUGH pallas kernel on its
                      output: ~68 us.  A do-nothing custom call whose
                      operand comes from an XLA conv segment costs ~57 us
                      at b1 — the operand handoff, not the kernel.
  3. ident_x2/x3    — chaining MORE pallas calls adds ~nothing: the tax is
                      per XLA-compute->pallas ENTRY, pallas->pallas is free.
  4. glue_pad/slice — trivial XLA glue (pad+reshape, stride-2 parity
                      slicing) BETWEEN pallas calls does not re-trigger it.
  5. flat_sum       — the layout conversion itself consumed by XLA: ~free.

Consequences:
  * Retroactively explains round-2's "~30 us per W4A8 insertion at b1" and
    every fused-block e2e loss at small batch: each mid-chain Pallas
    insertion pays the entry tax, which swamps kernel wins.
  * The fused stem never pays it (its operand is the jit input).
  * A serving chain can only win with ONE contiguous pallas region
    (stem -> ... -> layer4) where downsamples ride parity-split glue —
    the resident-chain design this probe motivates.

Run: python -m lowbitdnn_project_tpu.bench.probes.pallas_tax [batch]
(batch > 1 writes pallas_tax_b{N}_r4.json — the round-4 question: does the
~62 us entry tax persist at b2-b8, i.e. is a partial-resident region that
pays ONE tax live against the 266/462 us classic b4/b8 chains?)
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl                            # noqa: E402
from jax.experimental.pallas import tpu as pltpu                     # noqa: E402
from lowbitdnn_project_tpu.models import resnet                      # noqa: E402
from lowbitdnn_project_tpu.quant import quantize                     # noqa: E402
from lowbitdnn_project_tpu.quant.qtensor import QTensor              # noqa: E402
from lowbitdnn_project_tpu.ops import qconv2d                        # noqa: E402
from lowbitdnn_project_tpu.utils.timing import (                     # noqa: E402
    chain_via_scalar, chained_device_time)

CFG = resnet.RESNET50


def _idk(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def ident(x):
    return pl.pallas_call(
        _idk,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def main(batch=1):
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    qp8 = jax.jit(lambda: resnet.quantize_params(
        resnet.init_params(jax.random.key(0), CFG), CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        s = {k: jnp.asarray(v, jnp.float32)
             for k, v in json.load(f)["act_scales"].items()}
    mark("built")

    def ds_block(xq, qp):
        blk = qp["layer3"][0]
        h = qconv2d(xq, blk["conv1"].weight, blk["conv1"].bias, relu=True,
                    out_scale=s["layer3.0.conv2"])
        h = qconv2d(h, blk["conv2"].weight, blk["conv2"].bias, stride=2,
                    padding=1, relu=True, out_scale=s["layer3.0.conv3"])
        h = qconv2d(h, blk["conv3"].weight, blk["conv3"].bias)
        idn = qconv2d(xq, blk["downsample"].weight, blk["downsample"].bias,
                      stride=2)
        return quantize(jnp.maximum(h + idn, 0.0),
                        scale=s["layer3.1.conv1"])

    x28 = jnp.ones((batch, 28, 28, 512), jnp.int8)

    def v_ds(c, qp):
        y = ds_block(QTensor(values=c, scale=s["layer3.0.conv1"]), qp)
        return chain_via_scalar(c, y.values)

    def v_ident(n):
        def f(c, qp):
            y = ds_block(QTensor(values=c, scale=s["layer3.0.conv1"]), qp)
            z = y.values
            for _ in range(n):
                z = ident(z)
            return chain_via_scalar(c, z)
        return f

    def v_glue_pad(c, qp):
        y = ds_block(QTensor(values=c, scale=s["layer3.0.conv1"]), qp)
        z = ident(y.values)
        g = jnp.pad(z, ((0, 0), (0, 1), (0, 1), (0, 0))).reshape(
            batch, 15 * 15, 1024)
        return chain_via_scalar(c, ident(g))

    def v_glue_slice(c, qp):
        y = ds_block(QTensor(values=c, scale=s["layer3.0.conv1"]), qp)
        z = ident(y.values)
        return chain_via_scalar(c, ident(z[:, ::2, ::2, :]))

    # iteration counts sized so T(hi)-T(lo) >> the ~100 ms relay-jitter
    # floor (CLAUDE.md): ~5 us ops need ~20k chained iters, ~70 us need ~2k
    if batch == 1:
        variants = {
            "ds_only": (v_ds, 3000, 23000),
            "ds_plus_ident": (v_ident(1), 200, 1700),
            "ds_plus_ident_x2": (v_ident(2), 200, 1700),
            "ds_plus_ident_x3": (v_ident(3), 200, 1700),
            "glue_pad_between": (v_glue_pad, 200, 1700),
            "glue_slice_between": (v_glue_slice, 200, 1700),
        }
    else:
        # batch sweep: just the tax question (ds vs ds+ident); heavier ops
        # per iter, so fewer chained iters still clear the jitter floor
        variants = {
            "ds_only": (v_ds, 1000, 9000),
            "ds_plus_ident": (v_ident(1), 200, 1700),
            "ds_plus_ident_x2": (v_ident(2), 200, 1700),
        }
    best = {}
    for p in range(2):
        for name, (fn, lo, hi) in variants.items():
            t = chained_device_time(fn, x28, lo=lo, hi=hi, reps=3,
                                    args=(qp8,))
            best[name] = min(best.get(name, t), t)
            mark(f"{name} pass{p}: {t * 1e6:8.1f} us")

    us = {k: round(v * 1e6, 1) for k, v in best.items()}
    out = {"batch": batch, "us": us,
           "entry_tax_us": round(us["ds_plus_ident"] - us["ds_only"], 1)}
    if "ds_plus_ident_x3" in us:
        out["pallas_to_pallas_us"] = round(
            us["ds_plus_ident_x3"] - us["ds_plus_ident"], 1)
    elif "ds_plus_ident_x2" in us:
        out["pallas_to_pallas_us"] = round(
            us["ds_plus_ident_x2"] - us["ds_plus_ident"], 1)
    print(json.dumps(out, indent=1))
    name = ("pallas_tax_r3.json" if batch == 1
            else f"pallas_tax_b{batch}_r4.json")
    with open(name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
