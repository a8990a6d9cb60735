"""JSON-config benchmark sweep runner — reference cpp/apps/benchmark.cpp
re-expressed: reads configs.json, runs every (config x experiment-point)
pair that applies, writes output.json records.

Usage:  python -m lowbitdnn_project_tpu.bench.sweep [--config PATH]
        [--experiment NAME] [--out output.json] [--quick]
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.bench.roofline import (
    conv_cost,
    detect_chip,
    matmul_cost,
    roofline_pct,
)
from lowbitdnn_project_tpu.utils.timing import chained_device_time

_DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "configs.json")


def _rand_int8(rng, shape):
    return jnp.asarray(rng.integers(-50, 51, shape), jnp.int8)


def _chain_int(c, out):
    return c ^ (jnp.sum(out.astype(jnp.int32)).astype(c.dtype) & 1)


def _conv_step(cfg_name: str, x, w, stride, pad, scale):
    """Build the timed step for one conv config; returns None if N/A."""
    from lowbitdnn_project_tpu.ops.conv import conv2d_int32, DIMSPEC
    from lowbitdnn_project_tpu.kernels.conv_direct import conv2d_direct_int8
    from lowbitdnn_project_tpu.ops.winograd import (
        qconv2d_winograd, wino_quantize_filter)
    from lowbitdnn_project_tpu.quant import QTensor

    kh = w.shape[0]
    if cfg_name.startswith("int8_xla"):
        requant = not cfg_name.endswith("float_out")

        def step(c):
            acc = conv2d_int32(c, w, (stride, stride), (pad, pad))
            out = acc.astype(jnp.float32) * scale
            if requant:
                out = jnp.clip(jnp.round(out * 2.0), -127, 127).astype(jnp.int8)
            else:
                out = out.astype(jnp.bfloat16)
            return _chain_int(c, out)
        return step, x
    if cfg_name == "uint8_xla":
        # asymmetric uint8 activations (reference uint8x4 configs,
        # cpp/apps/config.json:55-80): int8 payload + zp=-128, zp-padding +
        # row-sum correction in the epilogue (ops/conv.py)
        from lowbitdnn_project_tpu.ops.conv import qconv2d
        wq = QTensor(values=w, scale=jnp.asarray(0.01, jnp.float32))
        zp = -128  # static metadata on QTensor

        def step(c):
            xq = QTensor(values=c, scale=jnp.asarray(0.004, jnp.float32),
                         zero_point=zp)
            q = qconv2d(xq, wq, stride=stride, padding=pad, relu=True,
                        out_scale=jnp.asarray(0.5, jnp.float32),
                        out_unsigned=True)
            return _chain_int(c, q.values)
        return step, x
    if cfg_name == "bf16_xla":
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

        def step(c):
            out = jax.lax.conv_general_dilated(
                c, wb, (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=DIMSPEC)
            return c + (jnp.sum(out) * 0).astype(c.dtype)
        return step, xb
    if cfg_name == "direct_pallas":
        if stride != 1 or x.shape[-1] % 128:
            return None

        def step(c):
            out = conv2d_direct_int8(c, w, scale.reshape(-1), kh=kh, kw=kh,
                                     padding=pad)
            return _chain_int(c, out)
        return step, x
    if cfg_name == "winograd_int8":
        if kh != 3 or stride != 1 or pad != 1 or x.shape[1] % 2:
            return None
        wq = QTensor(values=w, scale=jnp.asarray(0.05, jnp.float32))
        u, us = wino_quantize_filter(wq, mode="int8")
        if x.shape[-1] % 128 == 0:
            # fused Pallas kernel (transform domain stays in VMEM)
            from lowbitdnn_project_tpu.kernels.winograd_fused import (
                conv3x3_winograd_fused)

            def step(c):
                q = conv3x3_winograd_fused(
                    c, u, us, jnp.asarray(0.1, jnp.float32),
                    relu=True, out_scale=jnp.asarray(0.5), requant=True)
                return _chain_int(c, q)
            return step, x

        def step(c):
            q = qconv2d_winograd(
                QTensor(values=c, scale=jnp.asarray(0.1, jnp.float32)),
                u, us, relu=True, out_scale=jnp.asarray(0.5))
            return _chain_int(c, q.values)
        return step, x
    if cfg_name == "wpack":
        # output-pair-packed 3x3 (ops/wpack.py): the lane-starved-shape
        # formulation — only applies where BOTH lane dims are <=64-starved
        if kh != 3 or stride != 1 or pad != 1 or 2 * x.shape[-1] > 128 \
                or x.shape[2] % 2:
            return None
        from lowbitdnn_project_tpu.ops.wpack import (
            pack_wpair_weights, qconv3x3_wpack)
        wq = QTensor(values=w, scale=jnp.asarray(0.05, jnp.float32))
        wp = pack_wpair_weights(w)

        def step(c):
            q = qconv3x3_wpack(
                QTensor(values=c, scale=jnp.asarray(0.1, jnp.float32)), wq,
                relu=True, out_scale=jnp.asarray(0.5, jnp.float32), wpack=wp)
            return _chain_int(c, q.values)
        return step, x
    if cfg_name == "wpack_resident":
        # the packed-DOMAIN-RESIDENT conv (input pre-packed, output stays
        # packed): the boundary condition under which the w-pair
        # formulation beats XLA's emitter (bench_results_r2_wpack /
        # BENCH_NOTES). Honest label: excludes the pack/unpack relayouts.
        if kh != 3 or stride != 1 or pad != 1 or 2 * x.shape[-1] > 128 \
                or x.shape[2] % 2:
            return None
        from lowbitdnn_project_tpu.ops.wpack import pack_wpair_weights
        n, hh, wdim, cc = x.shape
        wp = pack_wpair_weights(w)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0))).reshape(
            n, hh, (wdim + 2) // 2, 2 * cc)

        def step(c):
            acc = jax.lax.conv_general_dilated(
                c, wp, (1, 1), ((1, 1), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            q = jnp.clip(jnp.round(acc.astype(jnp.float32) * 0.011),
                         -127, 127).astype(jnp.int8)
            return _chain_int(c, q)
        return step, xp
    if cfg_name == "int8_pallas_gemm":
        if kh != 1 or stride != 1:
            return None   # gemm conv path benched via 1x1 only
        from lowbitdnn_project_tpu.kernels.matmul_int8 import int8_matmul_fused
        n, h, wd, cin = x.shape
        a = x.reshape(n * h * wd, cin)
        wm = w.reshape(cin, -1)

        def step(c):
            out = int8_matmul_fused(c, wm, scale.reshape(-1), None,
                                    jnp.asarray(2.0), relu=True, requant=True)
            return _chain_int(c, out)
        return step, a
    return None


def _timed_adaptive(step, init, repeats, args=()):
    """Two-pass timing: if the measured delta window is under ~50 ms the
    point sits at the relay-jitter floor (round-1's 0.0us records) —
    re-measure with an iteration count sized for a ~100 ms delta."""
    t = chained_device_time(step, init, lo=repeats["lo"],
                            hi=repeats["hi"], args=args)
    if t * (repeats["hi"] - repeats["lo"]) < 0.05:
        iters = max(repeats["hi"], min(50_000, int(0.1 / max(t, 1e-7))))
        t = chained_device_time(step, init, lo=50, hi=50 + iters, args=args)
    return t


def run_conv_grid(exp: Dict[str, Any], configs: List[Dict[str, Any]],
                  repeats: Dict[str, int], seed=0, skip: int = 0,
                  sink=None) -> List[Dict[str, Any]]:
    rng = np.random.default_rng(seed)
    chip = detect_chip()
    results = []

    def _emit(rec):
        # incremental sink: multi-hour grids must survive a wedged relay
        # (round 4: the full plane stalled 28 min into a futex at cell 84 —
        # records only in the stdout log; --jsonl + --skip-cells resume)
        results.append(rec)
        if sink is not None:
            sink.write(json.dumps(rec) + "\n")
            sink.flush()

    cells = [c for c in itertools.product(
        exp["batch"], exp["spatial"], exp["channels"], exp["filters"])
        if c[3] >= c[2]]        # reference skips numFilters < C
    # deterministic grid subsampling for reference-scale planes (the full
    # {8..256}^2 x C,K{32..2048} x B{16..128} plane is hundreds of cells;
    # "sample": s keeps every s-th)
    cells = cells[::exp.get("sample", 1)]
    cells = cells[skip:]
    for b, hw, cin, cout in cells:
        k, stride, pad = exp["kernel"], exp["stride"], exp["pad"]
        oh_est = (hw + 2 * pad - k) // stride + 1
        est_bytes = (b * hw * hw * cin            # int8 activations
                     + b * oh_est * oh_est * cout * 4   # int32 acc
                     + k * k * cin * cout)
        if est_bytes > 4e9:
            # OOM guard: a killed/OOM'd kernel can wedge the remote device
            # for the rest of the process (CLAUDE.md) — skip, keep sweeping
            _emit(dict(experiment=exp["name"], batch=b, hw=hw,
                       cin=cin, cout=cout, skipped="oom-guard (>4GB)"))
            continue
        x = _rand_int8(rng, (b, hw, hw, cin))
        w = _rand_int8(rng, (k, k, cin, cout))
        scale = jnp.full((1, 1, 1, cout), 0.01, jnp.float32)
        oh = (hw + 2 * pad - k) // stride + 1
        # experiment-level config filter (e.g. wide_plane times only the
        # reference-analogous dtype configs, not every lab kernel)
        allowed = exp.get("configs")
        for cfg in configs:
            if allowed and cfg["name"] not in allowed:
                continue
            # score each config against ITS dtype's roofline
            if cfg["dtype"] == "bf16":
                cost = conv_cost(b, oh, oh, k, k, cin, cout, hw, hw,
                                 a_bytes=2, w_bytes=2, out_bytes=2)
                sol_dtype = "bf16"
            else:
                cost = conv_cost(b, oh, oh, k, k, cin, cout, hw, hw)
                sol_dtype = "int8"
            built = _conv_step(cfg["name"], x, w, stride, pad, scale)
            if built is None:
                continue
            step, init = built
            try:
                t = _timed_adaptive(step, init, repeats)
            except Exception as e:  # record failures, keep sweeping
                _emit(dict(experiment=exp["name"], config=cfg["name"],
                           batch=b, hw=hw, cin=cin, cout=cout,
                           error=f"{type(e).__name__}"))
                continue
            rec = dict(experiment=exp["name"], config=cfg["name"], batch=b,
                       hw=hw, cin=cin, cout=cout, k=k, stride=stride,
                       time_us=round(t * 1e6, 2),
                       tops=round(cost.flops / t / 1e12, 1),
                       roofline_pct=round(
                           roofline_pct(t, cost, chip, sol_dtype), 1))
            _emit(rec)
            print(rec)
    return results


def run_gemm_grid(exp, configs, repeats, seed=0):
    from lowbitdnn_project_tpu.kernels.matmul_int8 import (
        int8_matmul_fused, int8_matmul_xla)
    from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
        pack_int4_rows, w4a8_matmul_fused)

    rng = np.random.default_rng(seed)
    chip = detect_chip()
    results = []
    for m, k, n in itertools.product(exp["m"], exp["k"], exp["n"]):
        a = _rand_int8(rng, (m, k))
        w8 = _rand_int8(rng, (k, n))
        w4 = jnp.asarray(np.asarray(w8) % 15 - 7, jnp.int8)
        s = jnp.full((n,), 0.01, jnp.float32)
        costs = {
            "int8_xla": matmul_cost(m, k, n),
            "int8_pallas_gemm": matmul_cost(m, k, n),
            # w4a8 streams nibble-packed weights: K*N/2 bytes
            "w4a8_pallas": matmul_cost(m, k, n, b_bytes=0.5),
        }
        steps = {
            "int8_xla": (lambda c: _chain_int(c, int8_matmul_xla(c, w8, s)), a),
            "int8_pallas_gemm": (
                lambda c: _chain_int(c, int8_matmul_fused(c, w8, s)), a),
            "w4a8_pallas": (
                lambda c, wp=pack_int4_rows(w4): _chain_int(
                    c, w4a8_matmul_fused(c, wp, s)), a),
        }
        for cfg in configs:
            if cfg["name"] not in steps:
                continue
            step, init = steps[cfg["name"]]
            cost = costs[cfg["name"]]
            try:
                t = _timed_adaptive(step, init, repeats)
            except Exception as e:
                results.append(dict(experiment=exp["name"], config=cfg["name"],
                                    m=m, k=k, n=n, error=type(e).__name__))
                continue
            rec = dict(experiment=exp["name"], config=cfg["name"], m=m, k=k,
                       n=n, time_us=round(t * 1e6, 2),
                       tops=round(cost.flops / t / 1e12, 1),
                       roofline_pct=round(roofline_pct(t, cost, chip), 1))
            results.append(rec)
            print(rec)
    return results


def run_backward_grid(exp, repeats, seed=0):
    """Forward vs forward+backward conv timing, int8 vs float gradients —
    the reference's backward benchmark (python/benchmark_backward.py:17-116)
    re-expressed: both backward convs run as real int8 convs here
    (ops/grad.py), so this measures the int8-backward claim directly."""
    from lowbitdnn_project_tpu.ops.grad import make_qconv2d_train

    rng = np.random.default_rng(seed)
    results = []
    for b, hw, cin, cout in itertools.product(
            exp["batch"], exp["spatial"], exp["channels"], exp["filters"]):
        x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                        jnp.float32)
        for qg, name in ((True, "int8_bwd"), (False, "float_bwd")):
            qconv = make_qconv2d_train(padding=1, quantized_grads=qg)

            def fwd_step(c, w):
                out = qconv(c, w)
                return c + (jnp.sum(out) * 0).astype(c.dtype)

            def fwdbwd_step(c, w):
                out, vjp = jax.vjp(qconv, c, w)
                gx, gw = vjp(out)
                return c + ((jnp.sum(gx) + jnp.sum(gw)) * 0).astype(c.dtype)

            for phase, step in (("fwd", fwd_step), ("fwd+bwd", fwdbwd_step)):
                try:
                    t = chained_device_time(step, x, lo=repeats["lo"],
                                            hi=repeats["hi"], args=(w,))
                except Exception as e:
                    results.append(dict(experiment=exp["name"], config=name,
                                        phase=phase, batch=b, hw=hw, cin=cin,
                                        cout=cout, error=type(e).__name__))
                    continue
                rec = dict(experiment=exp["name"], config=name, phase=phase,
                           batch=b, hw=hw, cin=cin, cout=cout,
                           time_us=round(t * 1e6, 2))
                results.append(rec)
                print(rec)
    return results


def run_stem_grid(exp, repeats, seed=0):
    """Classic 7x7/s2+pool stem vs the space-to-depth stem (ops/stem.py)
    across batch sizes — the shape-specialized-kernel experiment
    (reference cpp/int8conv/check.cu:31-50 ethos)."""
    from lowbitdnn_project_tpu.ops.conv import qconv2d
    from lowbitdnn_project_tpu.ops.pool import qmax_pool2d
    from lowbitdnn_project_tpu.ops.stem import stem_conv_pool_s2d
    from lowbitdnn_project_tpu.quant import QTensor

    rng = np.random.default_rng(seed)
    w = _rand_int8(rng, (7, 7, 3, 64))
    ws = jnp.full((1, 1, 1, 64), 0.005, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    out_scale = jnp.float32(0.05)
    in_scale = jnp.float32(0.02)
    results = []
    for b in exp["batch"]:
        x = _rand_int8(rng, (b, 224, 224, 3))

        def classic(c, wv, s, bv):
            wq = QTensor(values=wv, scale=s, axis=3)
            h = qconv2d(QTensor(values=c, scale=in_scale), wq, bv, stride=2,
                        padding=3, relu=True, out_scale=out_scale,
                        backend="xla")
            return _chain_int(c, qmax_pool2d(h, 3, 2, 1).values)

        def s2d(c, wv, s, bv):
            wq = QTensor(values=wv, scale=s, axis=3)
            p = stem_conv_pool_s2d(QTensor(values=c, scale=in_scale), wq, bv,
                                   out_scale)
            return _chain_int(c, p.values)

        for name, step in (("stem_classic", classic), ("stem_s2d8", s2d)):
            try:
                t = chained_device_time(step, x, lo=repeats["lo"],
                                        hi=repeats["hi"], args=(w, ws, bias))
            except Exception as e:
                results.append(dict(experiment=exp["name"], config=name,
                                    batch=b, error=type(e).__name__))
                continue
            rec = dict(experiment=exp["name"], config=name, batch=b,
                       time_us=round(t * 1e6, 2))
            results.append(rec)
            print(rec)
    return results


def run_triple_grid(exp, repeats, seed=0):
    """Bottleneck triple (1x1 A->C, 3x3 C->C, 1x1 C->B + int8 residual
    tail): classic three-conv chain vs the output-pair-packed formulation
    (ops/wpack.py qbottleneck_wpack) — bit-exact same function, identical
    int8 NHWC boundaries, so this is the fair per-block A/B the lone-conv
    grid cannot express (the pack/unpack relayouts are absorbed by the
    1x1s). Variants interleaved across 2 passes, per-variant min (relay
    clock drift, CLAUDE.md)."""
    from lowbitdnn_project_tpu.models.layers import QConvParams
    from lowbitdnn_project_tpu.ops.conv import qconv2d
    from lowbitdnn_project_tpu.ops.wpack import qbottleneck_wpack
    from lowbitdnn_project_tpu.quant import QTensor

    rng = np.random.default_rng(seed)
    results = []
    for b in exp["batch"]:
        hw, a, c = exp["spatial"][0], exp["channels"][0], exp["mid"]
        mkp = lambda kh, kw, ci, co: QConvParams(
            weight=QTensor(values=_rand_int8(rng, (kh, kw, ci, co)),
                           scale=jnp.full((1, 1, 1, co), 0.01, jnp.float32),
                           axis=3),
            bias=jnp.asarray(rng.normal(size=(co,)), jnp.float32))
        p1, p2, p3 = mkp(1, 1, a, c), mkp(3, 3, c, c), mkp(1, 1, c, a)
        s2 = s3 = s_out = jnp.float32(0.05)
        x = _rand_int8(rng, (b, hw, hw, a))

        def classic(cx):
            x_q = QTensor(values=cx, scale=jnp.float32(0.02))
            h = qconv2d(x_q, p1.weight, p1.bias, relu=True, out_scale=s2)
            h = qconv2d(h, p2.weight, p2.bias, padding=1, relu=True,
                        out_scale=s3)
            h = qconv2d(h, p3.weight, p3.bias, relu=False, out_scale=s_out)
            r = jnp.round(x_q.values.astype(jnp.float32)
                          * (x_q.scale / s_out))
            idr = jnp.clip(r, -127, 127).astype(jnp.int8)
            out = jnp.clip(h.values.astype(jnp.int16) + idr.astype(jnp.int16),
                           0, 127).astype(jnp.int8)
            return _chain_int(cx, out)

        def packed(cx):
            x_q = QTensor(values=cx, scale=jnp.float32(0.02))
            out = qbottleneck_wpack(x_q, p1, p2, p3, s2, s3,
                                    out_scale=s_out, identity=x_q)
            return _chain_int(cx, out.values)

        best = {}
        for _ in range(2):
            for name, step in (("triple_classic", classic),
                               ("triple_wpack", packed)):
                try:
                    t = chained_device_time(step, x, lo=repeats["lo"],
                                            hi=repeats["hi"])
                except Exception as e:
                    best[name] = None
                    results.append(dict(experiment=exp["name"], config=name,
                                        batch=b, error=type(e).__name__))
                    continue
                best[name] = min(best.get(name) or 1e9, t)
        for name, t in best.items():
            if t is None:
                continue
            rec = dict(experiment=exp["name"], config=name, batch=b, hw=hw,
                       cin=a, mid=c, time_us=round(t * 1e6, 2))
            results.append(rec)
            print(rec)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=_DEFAULT_CONFIG)
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--out", default="output.json")
    ap.add_argument("--quick", action="store_true",
                    help="shrink grids to one point each")
    ap.add_argument("--skip-cells", type=int, default=0,
                    help="conv_grid resume: skip the first N grid cells "
                         "(cell order is deterministic). Requires "
                         "--experiment (the skip applies per conv_grid, so "
                         "running it against a multi-experiment config "
                         "would silently drop cells from every grid). The "
                         "--out JSON of a resumed run holds only the "
                         "post-skip records — merge with the --jsonl file "
                         "for the complete artifact.")
    ap.add_argument("--jsonl", default=None,
                    help="append each record to this JSONL file as it is "
                         "measured (crash/stall-safe incremental output)")
    args = ap.parse_args(argv)
    if args.skip_cells and not args.experiment:
        ap.error("--skip-cells requires --experiment: the skip applies to "
                 "every conv_grid it touches, so resuming a "
                 "multi-experiment config would drop cells from the other "
                 "grids")

    with open(args.config) as f:
        conf = json.load(f)
    repeats = conf.get("repeats", {"lo": 50, "hi": 550})
    sink = open(args.jsonl, "a") if args.jsonl else None
    results = []
    for exp in conf["experiments"]:
        if args.experiment and exp["name"] != args.experiment:
            continue
        if exp["kind"] == "conv_grid":
            e = dict(exp)
            if args.quick:
                for key in ("batch", "spatial", "channels", "filters"):
                    e[key] = e[key][:1]
            results += run_conv_grid(e, conf["configs"], repeats,
                                     skip=args.skip_cells, sink=sink)
        elif exp["kind"] == "gemm_grid":
            e = dict(exp)
            if args.quick:
                for key in ("m", "k", "n"):
                    e[key] = e[key][:1]
            results += run_gemm_grid(e, conf["configs"], repeats)
        elif exp["kind"] == "backward_grid":
            e = dict(exp)
            if args.quick:
                for key in ("batch", "spatial", "channels", "filters"):
                    e[key] = e[key][:1]
            results += run_backward_grid(e, repeats)
        elif exp["kind"] == "triple_grid":
            e = dict(exp)
            if args.quick:
                e["batch"] = e["batch"][:1]
            results += run_triple_grid(e, repeats)
        elif exp["kind"] == "stem_grid":
            e = dict(exp)
            if args.quick:
                e["batch"] = e["batch"][:1]
            results += run_stem_grid(e, repeats)
        elif exp["kind"] == "model_layers":
            from lowbitdnn_project_tpu.bench.harness import run_resnet50_sweep
            results += run_resnet50_sweep(exp["batch"][0])
    if sink is not None:
        sink.close()
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {len(results)} records to {args.out}")


if __name__ == "__main__":
    main()
