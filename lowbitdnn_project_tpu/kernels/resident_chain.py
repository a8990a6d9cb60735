"""The contiguous resident serving chain: stem -> layer4 with NO XLA
compute between Pallas kernels.

bench/probes/pallas_tax.py measured the batch-1 composition rules:
  * XLA compute -> pallas operand entry costs ~62 us (once per entry);
  * pallas -> pallas handoff is free;
  * trivial XLA glue (pad / reshape / stride-2 parity slicing) between
    pallas calls does not re-trigger the tax;
  * the jit input is a free operand (why the fused stem always won).

So the only serving formulation that can beat the classic chain's 110.8 us
(serving_latency_r3.json) is ONE contiguous pallas region: the fused stem
(jit input, no tax) feeds per-block kernels chained by glue only.  This
module provides the two block kernels the stage kernel
(kernels/stage_resident.py) cannot express, the parity-split glue, and the
whole-model orchestration:

  * block_proj_resident — stride-1 bottleneck block WITH a 1x1 projection
    identity (ResNet-50 layer1.0: C_in 64 -> C_out 256);
  * block_ds_resident   — stride-2 downsample block.  The stride never
    appears in-kernel (Mosaic has no strided slices): the input arrives as
    the four (h/2, w/2) PARITY PLANES, split in XLA glue (free), and each
    3x3 tap (dy, dx) becomes a static offset (oy, ox in {-1, 0}) into
    plane ((dy & 1), (dx & 1)) — the s2d identity 2i+dy = 2(i+oy)+parity;
  * pack_resident_chain / apply_serving_resident — precomputed weight pack
    and the stem->head forward.

Numerics: the engine's standard int8 chain, f32 epilogues, float-domain
residual adds — same as kernels/stage_resident.py / block_flat.py.

Reference parity anchors: python/custom_forward.py:15-75 (the reference's
batch-1 custom-forward-vs-cuDNN probe, taken to whole-model scope),
conv2DForward3x3Fused.cuh (fused quantize+conv ethos).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.stage_resident import (
    ResidentMeta, from_resident, resident_live_mask, resident_meta,
    to_resident,
)


# --------------------------------------------------------------- glue (XLA)

def parity_split(x: jax.Array) -> Tuple[jax.Array, ...]:
    """NHWC -> 4 parity planes (py, px) in row-major parity order."""
    return tuple(x[:, py::2, px::2, :] for py in (0, 1) for px in (0, 1))


# ------------------------------------------------- proj block (stride 1)

def _proj_kernel(xf_ref, w1_ref, w2_ref, w3_ref, wp_ref,
                 s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                 sp_ref, bp_ref, sc_ref, mask_ref, out_ref, y1_ref,
                 *, offsets, g8, bm, cmid):
    x = xf_ref[:]
    acc1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
    q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
    y1_ref[:] = jnp.where(mask_ref[:] != 0, q1, 0.0).astype(jnp.int8)

    acc2 = None
    for t, off in enumerate(offsets):
        d = jnp.dot(y1_ref[g8 + off:g8 + off + bm, :],
                    w2_ref[t * cmid:(t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                  ).astype(jnp.int8)

    acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
    h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
    accp = jnp.dot(x[g8:g8 + bm, :], wp_ref[:],
                   preferred_element_type=jnp.int32)
    proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
    out = jnp.maximum(h3 + proj, 0.0)
    q = jnp.clip(jnp.round(out * (1.0 / sc_ref[2])), -127.0, 127.0)
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.int8)   # guard rows
    out_ref[g8:g8 + bm, :] = jnp.where(
        mask_ref[g8:g8 + bm, :] != 0, q, 0.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def block_proj_resident(
    xf: jax.Array,               # (U, Cin) int8 flat
    w1: jax.Array,               # (Cin, Cmid)
    w2: jax.Array,               # (9*Cmid, Cmid)
    w3: jax.Array,               # (Cmid, Cout)
    wp: jax.Array,               # (Cin, Cout) 1x1 projection
    s1, b1, s2, b2, s3, b3, sp, bp,        # (1, C*) f32 epilogue rows
    chain_scales: jax.Array,     # (3,) f32 [y1s, y2s, out_s]
    *,
    meta: ResidentMeta,
    interpret: bool = False,
) -> jax.Array:
    """Stride-1 bottleneck block with projection identity (layer1.0)."""
    u, cin = xf.shape
    cmid, cout = w3.shape
    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_proj_kernel, offsets=offsets, g8=g8, bm=bm,
                               cmid=cmid)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 13 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((u, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((u, cmid), jnp.int8)],
        interpret=interpret,
    )(xf, w1, w2, w3, wp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)


# --------------------------------------------- downsample block (stride 2)

def _ds_kernel(x00_ref, x01_ref, x10_ref, x11_ref,
               w1_ref, w2_ref, w3_ref, wp_ref,
               s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
               sp_ref, bp_ref, sc_ref, mask_ref, out_ref,
               h00, h01, h10, h11,
               *, tap_plan, g8, bm, cmid):
    planes_in = (x00_ref, x01_ref, x10_ref, x11_ref)
    planes_h1 = (h00, h01, h10, h11)
    live = mask_ref[:] != 0
    # conv1 (1x1, stride 1 at full res == independent per parity plane)
    for xr, hr in zip(planes_in, planes_h1):
        acc1 = jnp.dot(xr[:], w1_ref[:], preferred_element_type=jnp.int32)
        h1 = jnp.maximum(acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:],
                         0.0)
        q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
        hr[:] = jnp.where(live, q1, 0.0).astype(jnp.int8)

    # conv2 (3x3 stride 2): tap (dy, dx) -> plane (dy&1, dx&1), offset
    # (oy, ox) in {-1, 0} rows of that plane's flat layout
    acc2 = None
    for t, (plane, off) in enumerate(tap_plan):
        d = jnp.dot(planes_h1[plane][g8 + off:g8 + off + bm, :],
                    w2_ref[t * cmid:(t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                  ).astype(jnp.int8)

    # conv3 + 1x1-stride-2 projection (= 1x1 on plane00) + relu + requant
    acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
    h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
    accp = jnp.dot(x00_ref[g8:g8 + bm, :], wp_ref[:],
                   preferred_element_type=jnp.int32)
    proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
    out = jnp.maximum(h3 + proj, 0.0)
    q = jnp.clip(jnp.round(out * (1.0 / sc_ref[2])), -127.0, 127.0)
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.int8)   # guard rows
    out_ref[g8:g8 + bm, :] = jnp.where(
        mask_ref[g8:g8 + bm, :] != 0, q, 0.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def block_ds_resident(
    planes: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    w1: jax.Array,               # (Cin, Cmid)
    w2: jax.Array,               # (9*Cmid, Cmid), taps row-major (dy, dx)
    w3: jax.Array,               # (Cmid, Cout)
    wp: jax.Array,               # (Cin, Cout) 1x1 s2 projection
    s1, b1, s2, b2, s3, b3, sp, bp,
    chain_scales: jax.Array,     # (3,) [y1s, y2s, out_s]
    *,
    meta: ResidentMeta,          # HALF-resolution geometry (h/2, w/2)
    interpret: bool = False,
) -> jax.Array:
    """Stride-2 downsample bottleneck block on parity-plane inputs.

    ``planes`` are the four (U_half, Cin) flat parity planes of the block
    input, order (py, px) = 00, 01, 10, 11 (from parity_split + to_resident
    glue).  Output is the (U_half, Cout) flat block output.
    """
    u, cin = planes[0].shape
    cmid, cout = w3.shape
    # tap (dy, dx), dy/dx in (-1, 0, 1): plane index (dy&1)*2 + (dx&1),
    # offset row (dy == -1 ? -1 : 0) * pitch + (dx == -1 ? -1 : 0)
    tap_plan = tuple(
        ((dy & 1) * 2 + (dx & 1),
         (-1 if dy == -1 else 0) * meta.pitch + (-1 if dx == -1 else 0))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_ds_kernel, tap_plan=tap_plan, g8=g8, bm=bm,
                               cmid=cmid)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 16 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((u, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((u, cmid), jnp.int8) for _ in range(4)],
        interpret=interpret,
    )(*planes, w1, w2, w3, wp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)


# ------------------------------------------------------------ orchestration

def _row(v, n):
    return jnp.broadcast_to(
        jnp.asarray(v, jnp.float32).reshape(-1), (n,)).reshape(1, n)


def pack_resident_chain(qparams: Dict[str, Any],
                        act_scales: Dict[str, jax.Array], cfg) -> Dict:
    """Precompute every block's kernel arguments (call once at prepare time).

    Returns {"blocks": [per-block dicts in chain order], "stem": ...} —
    identity blocks also get the stage-kernel pack via
    stage_resident.pack_stage_resident-compatible fields.
    """
    from lowbitdnn_project_tpu.kernels.stage_resident import (
        pack_stage_resident)

    s = act_scales

    def site(st, i):
        nblocks = cfg.stage_blocks[st]
        if i + 1 < nblocks:
            return f"layer{st + 1}.{i + 1}.conv1"
        if st < 3:
            return f"layer{st + 2}.0.conv1"
        return "fc"

    pack = {"entry": [], "stages": pack_stage_resident(
        qparams, s, cfg, stages=(0, 1, 2, 3), cmid_multiple=64)}
    for st in range(4):
        blk = qparams[f"layer{st + 1}"][0]
        pre = f"layer{st + 1}.0"
        x_s = s[f"{pre}.conv1"]
        y1_s, y2_s = s[f"{pre}.conv2"], s[f"{pre}.conv3"]
        o_s = s[site(st, 0)]
        w1q, w2q, w3q = (blk["conv1"].weight, blk["conv2"].weight,
                         blk["conv3"].weight)
        wpq = blk["downsample"].weight
        cin, cmid = w1q.shape[2:4]
        cout = w3q.shape[3]
        pack["entry"].append(dict(
            stride=2 if st > 0 else 1, cin=cin, cmid=cmid, cout=cout,
            w1=w1q.values[0, 0],
            w2=w2q.values.reshape(9 * cmid, cmid),
            w3=w3q.values[0, 0], wp=wpq.values[0, 0],
            s1=_row(x_s * w1q.scale_vector(), cmid),
            b1=_row(blk["conv1"].bias, cmid),
            s2=_row(y1_s * w2q.scale_vector(), cmid),
            b2=_row(blk["conv2"].bias, cmid),
            s3=_row(y2_s * w3q.scale_vector(), cout),
            b3=_row(blk["conv3"].bias, cout),
            sp=_row(x_s * wpq.scale_vector(), cout),
            bp=_row(blk["downsample"].bias, cout),
            chain=jnp.stack([jnp.asarray(v, jnp.float32)
                             for v in (y1_s, y2_s, o_s)]),
        ))
    return pack


def apply_serving_resident(qparams: Dict[str, Any], x, act_scales,
                           cfg, pack: Optional[Dict] = None, *,
                           interpret: bool = False) -> jax.Array:
    """Batch-1-class serving forward: stem -> layer4 as one contiguous
    pallas region (per-block kernels + free glue), head in XLA.

    ``pack`` from pack_resident_chain (pass it jitted-arg-style for zero
    per-call packing cost). Requires the bottleneck config with every
    stage's block 0 carrying a projection (ResNet-50/101 shape).
    """
    from lowbitdnn_project_tpu.kernels.stage_resident import (
        run_stage_resident, stage_resident_int8)
    from lowbitdnn_project_tpu.kernels.stem_fused import stem_conv_pool_fused
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor
    from lowbitdnn_project_tpu.ops import qlinear

    s = act_scales
    if pack is None:
        pack = pack_resident_chain(qparams, s, cfg)

    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
    x_q = stem_conv_pool_fused(x_q, qparams["conv1"].weight,
                               qparams["conv1"].bias,
                               s["layer1.0.conv1"], relu=True, version=3,
                               interpret=interpret)

    vals = x_q.values
    for st in range(4):
        e = pack["entry"][st]
        n, h, w, _ = vals.shape
        ch3 = e["chain"]
        args = (e["w1"], e["w2"], e["w3"], e["wp"], e["s1"], e["b1"],
                e["s2"], e["b2"], e["s3"], e["b3"], e["sp"], e["bp"], ch3)
        if e["stride"] == 1:
            m = resident_meta(n, h, w)
            vals = from_resident(
                block_proj_resident(to_resident(vals, m), *args, meta=m,
                                    interpret=interpret), m)
        else:
            mh = resident_meta(n, h // 2, w // 2)
            planes = tuple(to_resident(p, mh) for p in parity_split(vals))
            vals = from_resident(
                block_ds_resident(planes, *args, meta=mh,
                                  interpret=interpret), mh)
        # identity-block run of this stage in one dispatch
        sp_ = pack["stages"].get(st)
        if sp_ is not None and sp_["nblk"] > 0:
            q = run_stage_resident(
                QTensor(values=vals, scale=ch3[2]), sp_,
                interpret=interpret)
            vals, out_scale = q.values, q.scale
        else:
            out_scale = ch3[2]

    feat = jnp.mean(vals.astype(jnp.float32) * out_scale, axis=(1, 2))
    x_fc = quantize(feat, scale=s["fc"])
    return qlinear(x_fc, qparams["fc"].weight, qparams["fc"].bias,
                   interpret=interpret)
