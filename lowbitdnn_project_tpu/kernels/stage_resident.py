"""Kernel-lab generation v8: the VMEM-resident *stage* kernel for batch-1.

One Pallas dispatch runs ALL identity (stride-1, no-downsample) bottleneck
blocks of a ResNet stage: the grid iterates over blocks, each step streams
that block's three weight matrices into VMEM while the activation map stays
resident in the output buffer as the carry — at batch 1 a whole stage's
feature map is 64-468 KB, so it never touches HBM between blocks.

Why this regime is different from every fused-block kernel that lost before
(block_flat, block_l1 — KERNEL_LAB.md): at batch 1 the serving bisect
(serving_bisect_r3.json) showed the chain is PER-OP-OVERHEAD bound —
~1.6-2.3 us per XLA op across 42 convs + 13 block tails, against <10 us of
combined compute/weight floors for layers 1-3.  The fusion-neighborhood
rule that killed Pallas insertions at b32/b128 (five measured mis-ranks)
cannot apply when each XLA op's fixed cost dominates its compute: replacing
~4*Nblocks dispatches with ONE is attacking the measured bottleneck itself.

Layout: the flat pitched layout of kernels/conv_flat.py (conv taps = static
row offsets) but with the 1024-row MARGIN removed — at batch 1 that margin
was 4-15x the live rows (why `block_backend="flat"` measured 457.7 us at
b1).  Here the halo guard is just g8 = round_up(pitch+1, 8) rows of zeros
at each end, and the whole (U, C) map is VMEM-resident, so there is no
halo DMA at all.

Numerics: the engine's standard int8 chain with float-domain residual add
(models/resnet.py apply_quantized_int8chain add_domain="float"), identical
to kernels/block_flat.py — f32 epilogues, jnp.round requant, |delta|<=1 vs
the per-conv chain.

Reference parity anchors: python/custom_forward.py:15-75 (the reference's
own batch-1 custom-kernel-vs-cuDNN serving probe — this kernel is the TPU
answer at stage granularity), cpp/apps/custom_convolution/
custom2DConvolution.cuh v5/v6 (persistent in-block accumulation ethos).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.conv_flat import _round_up


class ResidentMeta(NamedTuple):
    """Geometry of the margin-free flat pitched layout (batch-agnostic,
    sized for small N where the whole map fits VMEM)."""
    n: int
    h: int
    w: int
    pitch: int   # W + 1 (shared zero column)
    seg: int     # (H + 1) * pitch (shared zero row)
    g8: int      # zero guard rows at each end, >= pitch + 1, 8-aligned
    body: int    # n * seg live-region rows
    u: int       # total rows = g8 + round_up(body + g8, 8)


def resident_meta(n: int, h: int, w: int) -> ResidentMeta:
    pitch = w + 1
    seg = (h + 1) * pitch
    g8 = _round_up(pitch + 1, 8)
    body = n * seg
    u = g8 + _round_up(body + g8, 8)
    return ResidentMeta(n, h, w, pitch, seg, g8, body, u)


def to_resident(x: jax.Array, meta: Optional[ResidentMeta] = None) -> jax.Array:
    """(N, H, W, C) int8 -> (U, C) margin-free flat pitched layout."""
    n, h, w, c = x.shape
    m = meta or resident_meta(n, h, w)
    body = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    body = body.reshape(n * m.seg, c)
    return jnp.pad(body, ((m.g8, m.u - m.g8 - m.body), (0, 0)))


def from_resident(xf: jax.Array, meta: ResidentMeta) -> jax.Array:
    """(U, C) flat -> (N, H, W, C), dropping pad rows/cols."""
    c = xf.shape[-1]
    body = jax.lax.slice(xf, (meta.g8, 0), (meta.g8 + meta.body, c))
    body = body.reshape(meta.n, meta.h + 1, meta.pitch, c)
    return body[:, :meta.h, :meta.w, :]


def resident_live_mask(meta: ResidentMeta) -> np.ndarray:
    """(U, 1) int8: 1 on live (n,h,w) rows, 0 on pad/guard rows."""
    mask = np.zeros((meta.u, 1), np.int8)
    rows = np.arange(meta.body)
    live = ((rows % meta.pitch) < meta.w) & \
           ((rows // meta.pitch) % (meta.h + 1) < meta.h)
    mask[meta.g8:meta.g8 + meta.body, 0] = live
    return mask


def _kernel(xf_ref, w1_ref, w2_ref, w3_ref,
            s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
            sc_ref, mask_ref, out_ref, y1_ref,
            *, offsets: Tuple[int, ...], g8: int, bm: int,
            cmid: int, nblk: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed_carry():
        out_ref[:] = xf_ref[:]

    x = out_ref[:]                                   # carry, (U, C) int8

    # conv1 (1x1) on ALL rows so conv2's taps have their halo; guard/pad
    # rows are zero in x, but bias would make them nonzero — the live mask
    # restores the layout invariant.
    acc1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * s1_ref[0] + b1_ref[0], 0.0)
    q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[i, 0])), -127.0, 127.0)
    y1_ref[:] = jnp.where(mask_ref[:] != 0, q1, 0.0).astype(jnp.int8)

    # conv2 (3x3) as tap-offset matmuls on the live window [g8, g8+bm)
    acc2 = None
    for t, off in enumerate(offsets):
        lhs = y1_ref[g8 + off:g8 + off + bm, :]
        d = jnp.dot(lhs, w2_ref[t * cmid:(t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[0] + b2_ref[0], 0.0)
    y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[i, 1])), -127.0, 127.0
                  ).astype(jnp.int8)

    # conv3 (1x1) + float-domain residual add + relu + requant
    acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
    h3 = acc3.astype(jnp.float32) * s3_ref[0] + b3_ref[0]
    identity = x[g8:g8 + bm, :].astype(jnp.float32) * sc_ref[i, 2]
    out = jnp.maximum(h3 + identity, 0.0)
    q = jnp.clip(jnp.round(out * (1.0 / sc_ref[i, 3])), -127.0, 127.0)
    out_ref[g8:g8 + bm, :] = jnp.where(
        mask_ref[g8:g8 + bm, :] != 0, q, 0.0).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "nblk", "interpret"),
)
def stage_resident_int8(
    xf: jax.Array,          # (U, C) int8, margin-free flat pitched layout
    w1: jax.Array,          # (nblk*C, Cmid) int8  stacked 1x1 reduce
    w2: jax.Array,          # (nblk*9*Cmid, Cmid) int8  stacked 3x3
    w3: jax.Array,          # (nblk*Cmid, C) int8  stacked 1x1 expand
    s1: jax.Array, b1: jax.Array,   # (nblk, Cmid) combined scale / bias
    s2: jax.Array, b2: jax.Array,   # (nblk, Cmid)
    s3: jax.Array, b3: jax.Array,   # (nblk, C)
    chain_scales: jax.Array,        # (nblk, 4) f32 [y1s, y2s, x_scale, out]
    *,
    meta: ResidentMeta,
    nblk: int,
    interpret: bool = False,
) -> jax.Array:
    """All nblk identity bottleneck blocks of a stage in ONE dispatch.

    The activation map lives in the output buffer across grid steps (the
    out BlockSpec never moves, so Pallas keeps it VMEM-resident as the
    carry); each grid step streams one block's weights.  Returns the
    stage-output feature map, (U, C) int8 at chain_scales[-1, 3].
    """
    u, c = xf.shape
    cmid = w1.shape[1]
    assert u == meta.u, (u, meta)
    assert w1.shape == (nblk * c, cmid), (w1.shape, nblk, c, cmid)
    assert w2.shape == (nblk * 9 * cmid, cmid), w2.shape
    assert w3.shape == (nblk * cmid, c), w3.shape

    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    assert g8 >= meta.pitch + 1 and bm >= meta.body

    mask = jnp.asarray(resident_live_mask(meta))

    kernel = functools.partial(
        _kernel, offsets=offsets, g8=g8, bm=bm, cmid=cmid, nblk=nblk)

    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((u, c), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c, cmid), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((9 * cmid, cmid), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((cmid, c), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # (nblk, 4) scales
            pl.BlockSpec((u, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((u, c), lambda i: (0, 0), memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((u, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((u, cmid), jnp.int8),             # y1 (+halo)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nblk * meta.u * cmid * (2 * c + 9 * cmid),
            bytes_accessed=meta.u * c * 2
            + nblk * cmid * (2 * c + 9 * cmid),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, w1, w2, w3,
      s1.astype(jnp.float32)[:, None], b1.astype(jnp.float32)[:, None],
      s2.astype(jnp.float32)[:, None], b2.astype(jnp.float32)[:, None],
      s3.astype(jnp.float32)[:, None], b3.astype(jnp.float32)[:, None],
      jnp.asarray(chain_scales, jnp.float32), mask)
    return out


# ------------------------------------------------------------- chain packing

def pack_stage_resident(
    qparams: Dict[str, Any],
    act_scales: Dict[str, jax.Array],
    cfg,
    stages: Tuple[int, ...] = (1, 2, 3),
    cmid_multiple: int = 128,
) -> Dict[int, Dict[str, Any]]:
    """Precompute stacked weights/scales for each stage's identity-block run.

    Call ONCE at model-prepare time (e.g. beside calibrate_act_scales) —
    stacking inside the jitted forward would re-concatenate 0.3-9 MB of
    weights every call.  Returns {stage_index: pack_dict} covering stages
    whose identity blocks satisfy the kernel contract (bottleneck, C and
    Cmid 128-multiples — layer1's cmid=64 is excluded by default).
    """
    if not cfg.bottleneck:
        return {}

    def site(st, i):          # mirror of apply_quantized_int8chain.next_site
        nblocks = cfg.stage_blocks[st]
        if i + 1 < nblocks:
            return f"layer{st + 1}.{i + 1}.conv1"
        if st < 3:
            return f"layer{st + 2}.0.conv1"
        return "fc"

    packs: Dict[int, Dict[str, Any]] = {}
    for st in stages:
        blocks = qparams[f"layer{st + 1}"]
        run = [i for i in range(1, len(blocks))
               if "downsample" not in blocks[i]]
        if run != list(range(1, len(blocks))) or not run:
            continue
        c_in, cmid = blocks[1]["conv1"].weight.shape[2:4]
        if c_in % 128 or cmid % cmid_multiple:
            continue
        w1s, w2s, w3s = [], [], []
        s1s, b1s, s2s, b2s, s3s, b3s, chains = [], [], [], [], [], [], []
        for i in run:
            blk = blocks[i]
            pre = f"layer{st + 1}.{i}"
            x_s = act_scales[f"{pre}.conv1"]
            y1_s = act_scales[f"{pre}.conv2"]
            y2_s = act_scales[f"{pre}.conv3"]
            o_s = act_scales[site(st, i)]
            w1q, w2q, w3q = (blk["conv1"].weight, blk["conv2"].weight,
                             blk["conv3"].weight)
            w1s.append(w1q.values[0, 0])
            w2s.append(w2q.values.reshape(9 * cmid, cmid))
            w3s.append(w3q.values[0, 0])
            s1s.append(x_s * w1q.scale_vector())
            b1s.append(blk["conv1"].bias)
            s2s.append(y1_s * w2q.scale_vector())
            b2s.append(blk["conv2"].bias)
            s3s.append(y2_s * w3q.scale_vector())
            b3s.append(blk["conv3"].bias)
            chains.append(jnp.stack([jnp.asarray(v, jnp.float32)
                                     for v in (y1_s, y2_s, x_s, o_s)]))
        packs[st] = dict(
            nblk=len(run),
            first=run[0],
            w1=jnp.concatenate(w1s), w2=jnp.concatenate(w2s),
            w3=jnp.concatenate(w3s),
            s1=jnp.stack(s1s), b1=jnp.stack(b1s),
            s2=jnp.stack(s2s), b2=jnp.stack(b2s),
            s3=jnp.stack(s3s), b3=jnp.stack(b3s),
            chain=jnp.stack(chains),
        )
    return packs


def run_stage_resident(x_q, pack, *, interpret: bool = False):
    """NHWC QTensor in -> NHWC QTensor out through one packed stage run."""
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    n, h, w, _ = x_q.values.shape
    meta = resident_meta(n, h, w)
    xf = to_resident(x_q.values, meta)
    yf = stage_resident_int8(
        xf, pack["w1"], pack["w2"], pack["w3"],
        pack["s1"], pack["b1"], pack["s2"], pack["b2"],
        pack["s3"], pack["b3"], pack["chain"],
        meta=meta, nblk=pack["nblk"], interpret=interpret)
    return QTensor(values=from_resident(yf, meta),
                   scale=pack["chain"][-1, 3])
