"""The contiguous resident serving chain: stem -> layer4 with NO XLA
compute between Pallas kernels.

bench/probes/pallas_tax.py measured the batch-1 composition rules:
  * XLA compute -> pallas operand entry costs ~62 us (once per entry);
  * pallas -> pallas handoff is free;
  * trivial XLA glue between pallas calls does not re-trigger the tax —
    but every glue op still pays the ~0.7-2 us per-op dispatch cost, so
    glue must be MINIMIZED (v1 of this chain round-tripped NHWC<->flat
    around every kernel: ~60 glue ops = ~40 us, resident_chain_ab v1);
  * the jit input is a free operand (why the fused stem always won).

v2 design: every kernel speaks NHWC at its boundary and builds the flat
pitched layout INTERNALLY (static per-row VPU copies — n*h slice copies,
h <= 56).  The only XLA ops between kernels are the four stride-2 parity
slices at each downsample boundary (the s2d identity 2i+dy = 2(i+oy)+p
turns the stride-2 3x3 into static offsets into parity planes — Mosaic has
no strided slices, XLA does them for free-ish).  conv2 uses a single-dot
patch build when cmid <= 64 (K=9*cmid=576 feeds the MXU a deep contraction
where per-tap K=64 GEMMs starve it).

Kernels:
  * block_proj_resident — stride-1 bottleneck block with 1x1 projection
    identity (layer1.0), NHWC -> NHWC;
  * block_ds_resident   — stride-2 downsample block on 4 NHWC parity
    planes -> NHWC;
  * stage_nhwc_resident — all identity blocks of a stage in ONE dispatch
    (grid over blocks, carry in VMEM scratch, weights streamed), NHWC IO —
    the NHWC twin of kernels/stage_resident.py.

Numerics: standard int8 chain, f32 epilogues, float-domain residual adds
(same as stage_resident.py / block_flat.py).

Reference parity anchors: python/custom_forward.py:15-75 (the reference's
batch-1 custom-forward-vs-cuDNN probe, taken to whole-model scope),
conv2DForward3x3Fused.cuh (fused quantize+conv ethos).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.stage_resident import (
    ResidentMeta, resident_live_mask, resident_meta,
)


# --------------------------------------------------------------- glue (XLA)

def fold_w(x: jax.Array) -> jax.Array:
    """NHWC -> (N, H, W/2, 2C): adjacent W-pairs folded into channels.

    ONE reshape (free glue, pallas_tax_r3) instead of four strided parity
    slices (which cost ~30 us at 56x56x256).  Lanes [:C] hold W-parity 0,
    lanes [C:] parity 1; H-parity needs no split at all — output rows are
    picked by STATIC row indices at unpack time."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


# ------------------------------------------------- in-kernel layout helpers

def _pack_rows(dst, src_ref, meta: ResidentMeta):
    """NHWC ref -> flat pitched scratch (guards/pads pre-zeroed)."""
    dst[:] = jnp.zeros(dst.shape, dst.dtype)
    for img in range(meta.n):
        base = meta.g8 + img * meta.seg
        for hh in range(meta.h):
            r = base + hh * meta.pitch
            dst[r:r + meta.w, :] = src_ref[img, hh]


def _unpack_rows(dst_ref, src, meta: ResidentMeta, src_off: int = 0):
    """flat pitched rows -> NHWC ref; src starts at flat row ``src_off``."""
    for img in range(meta.n):
        base = meta.g8 + img * meta.seg - src_off
        for hh in range(meta.h):
            r = base + hh * meta.pitch
            dst_ref[img, hh] = src[r:r + meta.w, :]


CHUNK = 2048  # row-chunk bound: int32 accumulators stay ~chunk*lanes*4 B
# (b1 geometries are under one chunk -> identical code; the bound is what
# lets the SAME kernels carry b4/b8 partial-resident maps within VMEM)


def _chunks(lo, hi, step=None):
    """Static [lo, hi) row chunks; lo and step are 8-aligned."""
    step = step or CHUNK   # read at call time (tests shrink CHUNK)
    return [(r, min(r + step, hi)) for r in range(lo, hi, step)]


def _conv2_acc(y1, w2_ref, patches, offsets, r0, n, cmid, single_dot):
    """3x3 tap accumulation on a flat y1 scratch; taps are row offsets.

    Covers rows [r0, r0+n). single_dot builds a (n, 9*cmid) patch scratch
    (9 shifted copies) and contracts K=9*cmid at once — at cmid=64 the
    per-tap K=64 GEMMs starve the int8 MXU pipeline, the deep contraction
    does not."""
    if single_dot:
        for t, off in enumerate(offsets):
            patches[:, t * cmid:(t + 1) * cmid] = \
                y1[r0 + off:r0 + off + n, :]
        return jnp.dot(patches[:], w2_ref[:],
                       preferred_element_type=jnp.int32)
    acc2 = None
    for t, off in enumerate(offsets):
        d = jnp.dot(y1[r0 + off:r0 + off + n, :],
                    w2_ref[t * cmid:(t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    return acc2


# ------------------------------------------------- proj block (stride 1)

def _proj_kernel(x_ref, w1_ref, w2_ref, w3_ref, wp_ref,
                 s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                 sp_ref, bp_ref, sc_ref, mask_ref, out_ref,
                 xs, y1_ref, *rest,
                 offsets, g8, bm, cmid, meta, single_dot):
    patches = rest[0] if single_dot else None
    _pack_rows(xs, x_ref, meta)
    x = xs[:]
    acc1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
    q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
    y1_ref[:] = jnp.where(mask_ref[:] != 0, q1, 0.0).astype(jnp.int8)

    acc2 = _conv2_acc(y1_ref, w2_ref, patches, offsets, g8, bm, cmid,
                      single_dot)
    h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                  ).astype(jnp.int8)

    acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
    h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
    accp = jnp.dot(x[g8:g8 + bm, :], wp_ref[:],
                   preferred_element_type=jnp.int32)
    proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
    out = jnp.maximum(h3 + proj, 0.0)
    q = jnp.clip(jnp.round(out * (1.0 / sc_ref[2])),
                 -127.0, 127.0).astype(jnp.int8)
    _unpack_rows(out_ref, q, meta, src_off=g8)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def block_proj_resident(
    x: jax.Array,                # (N, H, W, Cin) int8 NHWC
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
    """Stride-1 bottleneck block with projection identity, NHWC -> NHWC."""
    n, h, w, cin = x.shape
    cmid, cout = w3.shape
    single_dot = cmid <= 64
    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_proj_kernel, offsets=offsets, g8=g8, bm=bm,
                               cmid=cmid, meta=meta, single_dot=single_dot)
    scratch = [pltpu.VMEM((meta.u, cin), jnp.int8),
               pltpu.VMEM((meta.u, cmid), jnp.int8)]
    if single_dot:
        scratch.append(pltpu.VMEM((bm, 9 * cmid), jnp.int8))
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 13 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w1, w2, w3, wp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)


# --------------------------------------------- downsample block (stride 2)

def _ds_kernel(xf_ref, w1_ref, w2a_ref, w2b_ref, w3_ref, wp_ref,
               s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
               sp_ref, bp_ref, sc_ref, mask_ref, out_ref,
               xs, h1f, qbuf,
               g8, bm, cin, cmid, meta, out_meta):
    # pack the folded (N, H, W/2, 2C) input into flat pitched rows
    _pack_rows(xs, xf_ref, meta)

    # conv1 (1x1) per W-parity half into the two lane halves of h1f;
    # row-chunked so the int32 accumulator stays ~CHUNK*cmid*4 B (b1
    # geometries fit one chunk; b4/b8 partial-resident maps need several)
    for half in (0, 1):
        for r0, r1 in _chunks(0, meta.u):
            acc1 = jnp.dot(xs[r0:r1, half * cin:(half + 1) * cin],
                           w1_ref[:], preferred_element_type=jnp.int32)
            h1 = jnp.maximum(
                acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
            q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
            h1f[r0:r1, half * cmid:(half + 1) * cmid] = jnp.where(
                mask_ref[r0:r1] != 0, q1, 0.0).astype(jnp.int8)

    # conv2 (3x3 s2) on the folded layout: tap (dy, dx) ->
    #   dx=0  -> lanes [:cmid]   of folded col j    (row offset dy*pitch)
    #   dx=+1 -> lanes [cmid:]   of folded col j    (same row offset)
    #   dx=-1 -> lanes [cmid:]   of folded col j-1  (row offset dy*pitch-1)
    # computed at ALL folded rows (odd output rows are discarded at unpack;
    # 2x H compute waste is microseconds at batch-1 sizes)
    for r0, r1 in _chunks(g8, g8 + bm):
        n = r1 - r0
        acc2 = None
        for t, dy in enumerate((-1, 0, 1)):
            off = dy * meta.pitch
            da = jnp.dot(h1f[r0 + off:r0 + off + n, :],
                         w2a_ref[t * 2 * cmid:(t + 1) * 2 * cmid, :],
                         preferred_element_type=jnp.int32)
            db = jnp.dot(h1f[r0 + off - 1:r0 + off - 1 + n, cmid:],
                         w2b_ref[t * cmid:(t + 1) * cmid, :],
                         preferred_element_type=jnp.int32)
            d = da + db
            acc2 = d if acc2 is None else acc2 + d
        h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:],
                         0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                      ).astype(jnp.int8)

        # conv3 + projection (1x1 s2 == lanes [:cin] of the folded input)
        acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
        accp = jnp.dot(xs[r0:r1, :cin], wp_ref[:],
                       preferred_element_type=jnp.int32)
        proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
        out = jnp.maximum(h3 + proj, 0.0)
        qbuf[r0 - g8:r1 - g8, :] = jnp.clip(
            jnp.round(out * (1.0 / sc_ref[2])), -127.0, 127.0
        ).astype(jnp.int8)
    # unpack: output row hh <- folded row 2*hh (static picks drop odd rows)
    for img in range(out_meta.n):
        for hh in range(out_meta.h):
            r = meta.g8 + img * meta.seg + (2 * hh) * meta.pitch - g8
            out_ref[img, hh] = qbuf[r:r + out_meta.w, :]


@functools.partial(jax.jit, static_argnames=("meta", "out_meta", "interpret"))
def block_ds_resident(
    xf: jax.Array,               # (N, H, W/2, 2*Cin) int8, fold_w output
    w1: jax.Array,               # (Cin, Cmid)
    w2a: jax.Array,              # (3*2*Cmid, Cmid): per dy, vstack(dx=0, dx=+1)
    w2b: jax.Array,              # (3*Cmid, Cmid):   per dy, dx=-1
    w3: jax.Array,               # (Cmid, Cout)
    wp: jax.Array,               # (Cin, Cout) 1x1 s2 projection
    s1, b1, s2, b2, s3, b3, sp, bp,
    chain_scales: jax.Array,     # (3,) [y1s, y2s, out_s]
    *,
    meta: ResidentMeta,          # FOLDED geometry: (n, h, w//2)
    out_meta: ResidentMeta,      # output geometry: (n, h//2, w//2)
    interpret: bool = False,
) -> jax.Array:
    """Stride-2 downsample bottleneck block on the folded-W layout.

    The only glue upstream is fold_w's single reshape; stride never appears
    in-kernel (static row offsets + 128-aligned lane slices)."""
    n, h, w2v, cin2 = xf.shape
    cin = cin2 // 2
    cmid, cout = w3.shape
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_ds_kernel, g8=g8, bm=bm, cin=cin,
                               cmid=cmid, meta=meta, out_meta=out_meta)
    scratch = [pltpu.VMEM((meta.u, 2 * cin), jnp.int8),
               pltpu.VMEM((meta.u, 2 * cmid), jnp.int8),
               pltpu.VMEM((bm, cout), jnp.int8)]
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 14 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(
            (out_meta.n, out_meta.h, out_meta.w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xf, w1, w2a, w2b, w3, wp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)


# ------------------------------------- identity stage, NHWC IO (grid=blocks)

def _stage_kernel(x_ref, w1_ref, w2_ref, w3_ref,
                  s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                  sc_ref, mask_ref, out_ref, carry, y1_ref, *rest,
                  offsets, g8, bm, cmid, nblk, meta, single_dot):
    patches = rest[0] if single_dot else None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        _pack_rows(carry, x_ref, meta)

    # conv1 on ALL rows (conv2 needs the halo), row-chunked (int32
    # accumulators stay ~CHUNK*cmid*4 B — what lets the same kernel carry
    # b4/b8 partial-resident maps; b1 geometries are one chunk)
    for r0, r1 in _chunks(0, meta.u):
        acc1 = jnp.dot(carry[r0:r1, :], w1_ref[:],
                       preferred_element_type=jnp.int32)
        h1 = jnp.maximum(
            acc1.astype(jnp.float32) * s1_ref[0] + b1_ref[0], 0.0)
        q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[i, 0])), -127.0, 127.0)
        y1_ref[r0:r1, :] = jnp.where(mask_ref[r0:r1] != 0, q1,
                                     0.0).astype(jnp.int8)

    body = ([(g8, g8 + bm)] if single_dot else _chunks(g8, g8 + bm))
    for r0, r1 in body:
        n = r1 - r0
        acc2 = _conv2_acc(y1_ref, w2_ref, patches, offsets, r0, n, cmid,
                          single_dot)
        h2 = jnp.maximum(
            acc2.astype(jnp.float32) * s2_ref[0] + b2_ref[0], 0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[i, 1])), -127.0, 127.0
                      ).astype(jnp.int8)

        acc3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * s3_ref[0] + b3_ref[0]
        identity = carry[r0:r1, :].astype(jnp.float32) * sc_ref[i, 2]
        out = jnp.maximum(h3 + identity, 0.0)
        q = jnp.clip(jnp.round(out * (1.0 / sc_ref[i, 3])), -127.0, 127.0)
        carry[r0:r1, :] = jnp.where(
            mask_ref[r0:r1, :] != 0, q, 0.0).astype(jnp.int8)

    @pl.when(i == nblk - 1)
    def _emit():
        _unpack_rows(out_ref, carry[:], meta)


@functools.partial(jax.jit, static_argnames=("meta", "nblk", "interpret"))
def stage_nhwc_resident(
    x: jax.Array,           # (N, H, W, C) int8 NHWC
    w1: jax.Array,          # (nblk*C, Cmid) stacked
    w2: jax.Array,          # (nblk*9*Cmid, Cmid)
    w3: jax.Array,          # (nblk*Cmid, C)
    s1, b1, s2, b2,         # (nblk, Cmid)
    s3, b3,                 # (nblk, C)
    chain_scales: jax.Array,    # (nblk, 4) [y1s, y2s, x_s, out_s]
    *,
    meta: ResidentMeta,
    nblk: int,
    interpret: bool = False,
) -> jax.Array:
    """All identity blocks of a stage in ONE dispatch, NHWC in/out.

    NHWC twin of kernels/stage_resident.py:stage_resident_int8 — the flat
    pitched carry lives in VMEM scratch, packed/unpacked with static row
    copies at the grid's first/last step; each step streams one block's
    weights."""
    n, h, w, c = x.shape
    cmid = w1.shape[1]
    single_dot = cmid <= 64
    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    kernel = functools.partial(_stage_kernel, offsets=offsets, g8=g8, bm=bm,
                               cmid=cmid, nblk=nblk, meta=meta,
                               single_dot=single_dot)
    scratch = [pltpu.VMEM((meta.u, c), jnp.int8),
               pltpu.VMEM((meta.u, cmid), jnp.int8)]
    if single_dot:
        scratch.append(pltpu.VMEM((bm, 9 * cmid), jnp.int8))
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((n, h, w, c), lambda i: (0, 0, 0, 0),
                         memory_space=vm),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((meta.u, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((n, h, w, c), lambda i: (0, 0, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w1, w2, w3,
      s1.astype(jnp.float32)[:, None], b1.astype(jnp.float32)[:, None],
      s2.astype(jnp.float32)[:, None], b2.astype(jnp.float32)[:, None],
      s3.astype(jnp.float32)[:, None], b3.astype(jnp.float32)[:, None],
      jnp.asarray(chain_scales, jnp.float32), mask)



# ------------------------------------------------ folded-W weight transforms

def _blockdiag(w: jax.Array) -> jax.Array:
    """(K, N) -> (2K, 2N) block-diagonal [[w, 0], [0, w]]."""
    z = jnp.zeros_like(w)
    return jnp.concatenate([jnp.concatenate([w, z], 1),
                            jnp.concatenate([z, w], 1)], 0)


def fold_block_weights(w1, w2v, w3, wp=None):
    """Transform one bottleneck block's weights for the folded-W layout.

    In folded coordinates ((N, H, W/2, 2C): W-pairs in channel halves) a
    stride-1 3x3 conv is AGAIN a 3x3 tap accumulation — tap (dy, q) with
    q in {-1, 0, +1} folded-column offsets — with (2Cmid, 2Cmid) weights
    whose lane blocks route the odd/even output positions:
      q=-1: rows[c:], cols[:c] = w2[dy, -1]
      q= 0: rows[:c]cols[:c]=w2[dy,0]; rows[c:]cols[:c]=w2[dy,+1];
            rows[:c]cols[c:]=w2[dy,-1]; rows[c:]cols[c:]=w2[dy,0]
      q=+1: rows[:c], cols[c:] = w2[dy, +1]
    1x1 convs become block-diagonal.  This doubles every lane dimension —
    layer1's cmid=64 (half-empty MXU lanes, the measured 26%-of-peak
    starvation class) runs at full 128 lanes, for 2x MAC padding that is
    microseconds at batch 1.
    """
    c = w2v.shape[2]
    z = jnp.zeros((c, c), w2v.dtype)

    def qmat(dy, q):
        if q == -1:
            return jnp.concatenate([jnp.concatenate([z, z], 1),
                                    jnp.concatenate([w2v[dy, 0], z], 1)], 0)
        if q == 0:
            return jnp.concatenate(
                [jnp.concatenate([w2v[dy, 1], w2v[dy, 0]], 1),
                 jnp.concatenate([w2v[dy, 2], w2v[dy, 1]], 1)], 0)
        return jnp.concatenate([jnp.concatenate([z, w2v[dy, 2]], 1),
                                jnp.concatenate([z, z], 1)], 0)

    w2f = jnp.concatenate([qmat(dy, q) for dy in range(3)
                           for q in (-1, 0, 1)])
    out = dict(w1=_blockdiag(w1), w2=w2f, w3=_blockdiag(w3))
    if wp is not None:
        out["wp"] = _blockdiag(wp)
    return out


def _tile2(row):
    """(1, C) or (nblk, C) epilogue row -> lanes duplicated for folding."""
    return jnp.concatenate([row, row], axis=-1)


# ------------------------------------------------------------ orchestration

def _row(v, n):
    return jnp.broadcast_to(
        jnp.asarray(v, jnp.float32).reshape(-1), (n,)).reshape(1, n)


def pack_resident_chain(qparams: Dict[str, Any],
                        act_scales: Dict[str, jax.Array], cfg) -> Dict:
    """Precompute every block's kernel arguments (call once at prepare time).

    The returned pack mixes device arrays with static python ints (stride,
    channel dims, nblk) — when jitting a caller, pass the arrays as jit
    args and keep the statics out of the traced pytree (see
    bench/probes/resident_chain_ab.py split_pack/merge_pack).
    """
    from lowbitdnn_project_tpu.kernels.stage_resident import (
        pack_stage_resident)

    if not cfg.bottleneck:
        raise NotImplementedError(
            "resident chain needs the bottleneck block shape "
            "(ResNet-50/101); basic-block configs serve via the classic "
            "chain")
    for st in range(4):
        if "downsample" not in qparams[f"layer{st + 1}"][0]:
            raise NotImplementedError(
                f"resident chain expects a projection in layer{st + 1}.0 "
                "(torchvision ResNet-50 shape)")

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
    if 0 in pack["stages"]:
        # layer1 runs in the folded-W layout (see fold_block_weights):
        # refold the stacked stage pack blockwise
        sp0 = pack["stages"][0]
        nblk = sp0["nblk"]
        cmid = sp0["w1"].shape[1]
        c = sp0["w3"].shape[1]
        w1s, w2s, w3s = [], [], []
        for b in range(nblk):
            f = fold_block_weights(
                sp0["w1"][b * c:(b + 1) * c],
                sp0["w2"][b * 9 * cmid:(b + 1) * 9 * cmid].reshape(
                    3, 3, cmid, cmid),
                sp0["w3"][b * cmid:(b + 1) * cmid])
            w1s.append(f["w1"]); w2s.append(f["w2"]); w3s.append(f["w3"])
        pack["stages"][0] = dict(
            sp0, folded=True,
            w1=jnp.concatenate(w1s), w2=jnp.concatenate(w2s),
            w3=jnp.concatenate(w3s),
            s1=_tile2(sp0["s1"]), b1=_tile2(sp0["b1"]),
            s2=_tile2(sp0["s2"]), b2=_tile2(sp0["b2"]),
            s3=_tile2(sp0["s3"]), b3=_tile2(sp0["b3"]))
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
        w2v = w2q.values                       # (3, 3, cmid, cmid), [dy, dx]
        rows = dict(
            s1=_row(x_s * w1q.scale_vector(), cmid),
            b1=_row(blk["conv1"].bias, cmid),
            s2=_row(y1_s * w2q.scale_vector(), cmid),
            b2=_row(blk["conv2"].bias, cmid),
            s3=_row(y2_s * w3q.scale_vector(), cout),
            b3=_row(blk["conv3"].bias, cout),
            sp=_row(x_s * wpq.scale_vector(), cout),
            bp=_row(blk["downsample"].bias, cout))
        if st > 0:
            # folded-W stride-2 tap layout: per dy, vstack(dx=0, dx=+1)
            # feeds lanes [:cmid]/[cmid:] of folded h1; dx=-1 separate
            wts = dict(
                w1=w1q.values[0, 0],
                w2a=jnp.concatenate([
                    jnp.concatenate([w2v[dy, 1], w2v[dy, 2]])
                    for dy in range(3)]),
                w2b=jnp.concatenate([w2v[dy, 0] for dy in range(3)]),
                w3=w3q.values[0, 0], wp=wpq.values[0, 0])
        else:
            # layer1.0 projection block runs folded end to end
            wts = fold_block_weights(w1q.values[0, 0], w2v,
                                     w3q.values[0, 0], wpq.values[0, 0])
            rows = {k: _tile2(v) for k, v in rows.items()}
        pack["entry"].append(dict(
            stride=2 if st > 0 else 1, cin=cin, cmid=cmid, cout=cout,
            **wts, **rows,
            chain=jnp.stack([jnp.asarray(v, jnp.float32)
                             for v in (y1_s, y2_s, o_s)]),
        ))
    return pack


def run_resident_stages(vals: jax.Array, folded: bool, pack: Dict, *,
                        start_stage: int = 0, interpret: bool = False):
    """Run residual stages ``start_stage``..3 through the resident kernels.

    ``vals`` is the int8 NHWC feature map entering stage ``start_stage``
    (already fold_w-folded iff ``folded``); returns (vals, out_scale) after
    layer4. Shared by the full resident chain (start 0) and the
    partial-resident serving lanes (start 1/2 at b4/b8, where layer1's
    VMEM footprint exceeds the chip). Pack entries carrying ``w4=True``
    (kernels/resident_w4a8.py nibble-packed weights) route to the W4A8
    kernel twins automatically."""
    from lowbitdnn_project_tpu.kernels import resident_w4a8

    out_scale = None
    for st in range(start_stage, 4):
        e = pack["entry"][st]
        ch3 = e["chain"]
        tail = (e["s1"], e["b1"], e["s2"], e["b2"], e["s3"], e["b3"],
                e["sp"], e["bp"], ch3)
        if e["stride"] == 1:
            n, h, wv, _ = vals.shape   # already folded (n, h, w/2, 2c)
            m = resident_meta(n, h, wv)
            vals = block_proj_resident(
                vals, e["w1"], e["w2"], e["w3"], e["wp"], *tail, meta=m,
                interpret=interpret)
        else:
            if not folded:
                vals = fold_w(vals)
            n, h, wv, _ = vals.shape   # folded (n, h, w/2, 2c)
            mf = resident_meta(n, h, wv)
            mo = resident_meta(n, h // 2, wv)
            if e.get("stream"):
                from lowbitdnn_project_tpu.kernels.resident_stream import (
                    block_ds_resident_stream)
                ds = functools.partial(block_ds_resident_stream,
                                       packed=bool(e.get("w4")))
            elif e.get("w4"):
                ds = resident_w4a8.block_ds_resident_w4
            else:
                ds = block_ds_resident
            vals = ds(
                vals, e["w1"], e["w2a"], e["w2b"], e["w3"],
                e["wp"], *tail, meta=mf, out_meta=mo, interpret=interpret)
            folded = False
        sp_ = pack["stages"].get(st)
        if sp_ is not None and sp_["nblk"] > 0:
            n2, h2v, w2v_, _ = vals.shape
            m2 = resident_meta(n2, h2v, w2v_)
            if sp_.get("w4"):
                stage = resident_w4a8.stage_nhwc_resident_w4
            elif sp_.get("stream"):
                from lowbitdnn_project_tpu.kernels.resident_stream import (
                    stage_nhwc_resident_stream)
                stage = stage_nhwc_resident_stream
            else:
                stage = stage_nhwc_resident
            vals = stage(
                vals, sp_["w1"], sp_["w2"], sp_["w3"],
                sp_["s1"], sp_["b1"], sp_["s2"], sp_["b2"],
                sp_["s3"], sp_["b3"], sp_["chain"],
                meta=m2, nblk=sp_["nblk"], interpret=interpret)
            out_scale = sp_["chain"][-1, 3]
        else:
            out_scale = ch3[2]
    return vals, out_scale


def _resident_head(qparams, vals, out_scale, act_scales, *,
                   interpret: bool = False) -> jax.Array:
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.ops import qlinear

    feat = jnp.mean(vals.astype(jnp.float32) * out_scale, axis=(1, 2))
    x_fc = quantize(feat, scale=act_scales["fc"])
    return qlinear(x_fc, qparams["fc"].weight, qparams["fc"].bias,
                   interpret=interpret)


def apply_serving_resident(qparams: Dict[str, Any], x, act_scales,
                           cfg, pack: Optional[Dict] = None, *,
                           interpret: bool = False) -> jax.Array:
    """Batch-1-class serving forward: stem -> layer4 as one contiguous
    pallas region (per-block NHWC kernels, parity-slice glue only), head
    in XLA."""
    from lowbitdnn_project_tpu.kernels.stem_fused import stem_conv_pool_fused
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    s = act_scales
    if pack is None:
        pack = pack_resident_chain(qparams, s, cfg)

    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
    x_q = stem_conv_pool_fused(x_q, qparams["conv1"].weight,
                               qparams["conv1"].bias,
                               s["layer1.0.conv1"], relu=True, version=3,
                               interpret=interpret)

    # layer1 runs in the folded-W layout
    vals, out_scale = run_resident_stages(
        fold_w(x_q.values), True, pack, start_stage=0, interpret=interpret)
    return _resident_head(qparams, vals, out_scale, s, interpret=interpret)


def apply_serving_partial_resident(
    qparams: Dict[str, Any], x, act_scales, cfg,
    pack: Optional[Dict] = None, *,
    start_stage: int = 1,
    backend: str = "xla",
    interpret: bool = False,
) -> jax.Array:
    """Partial-resident serving: stem..layer{start_stage} through the
    classic XLA chain, then ONE contiguous pallas region for the rest.

    The b4/b8 lane motivated by pallas_tax: the full resident chain is
    VMEM-bound to b1 (layer1's folded maps + accumulators), but the tax is
    paid once per XLA->pallas entry — a layer{start_stage+1}->layer4
    region pays ONE tax while replacing the per-op-dispatch-bound deep
    stages. start_stage=1 keeps layer1 classic (b4), start_stage=2 keeps
    layers 1-2 classic (b8)."""
    from lowbitdnn_project_tpu.models import resnet

    s = act_scales
    if pack is None:
        pack = pack_resident_chain(qparams, s, cfg)
    x_q = resnet.apply_quantized_int8chain(
        qparams, x, s, cfg, backend=backend,
        stop_after_stage=start_stage, interpret=interpret)
    vals, out_scale = run_resident_stages(
        x_q.values, False, pack, start_stage=start_stage,
        interpret=interpret)
    return _resident_head(qparams, vals, out_scale, s, interpret=interpret)


# ---------------------------------------------- jit-boundary pack splitting

ENTRY_STATIC = ("stride", "cin", "cmid", "cout", "stream")
STAGE_STATIC = ("nblk", "first", "folded", "stream")


def mark_stream(pack, stages=(1, 2, 3)):
    """Route the given downsample entries through the DMA-streamed ds
    kernel (kernels/resident_stream.py). Returns the pack (mutated)."""
    for st in stages:
        if pack["entry"][st]["stride"] == 2:
            pack["entry"][st]["stream"] = True
    return pack


def mark_stage_stream(pack, stages=(1, 2, 3)):
    """Route the given identity-stage runs through the use-order
    DMA-streamed stage kernel (kernels/resident_stream.py:
    stage_nhwc_resident_stream) instead of the grid-prologue version.
    cmid<=64 (single-dot) and W4 stage packs are left on their own
    kernels. Returns the pack (mutated)."""
    for st in stages:
        sp_ = pack["stages"].get(st)
        if sp_ is None or sp_.get("w4"):
            continue
        if sp_["w1"].shape[1] > 64:
            sp_["stream"] = True
    return pack


def split_pack(pack):
    """(arrays-only pytree, statics) — the pack mixes device arrays with
    static python ints; statics must not cross a jit boundary as traced
    values (nblk is a static_argname downstream, stride drives python
    control flow)."""
    arrs = {"entry": [{k: v for k, v in e.items() if k not in ENTRY_STATIC}
                      for e in pack["entry"]],
            "stages": {st: {k: v for k, v in p.items()
                            if k not in STAGE_STATIC}
                       for st, p in pack["stages"].items()}}
    statics = {"entry": [{k: e[k] for k in ENTRY_STATIC if k in e}
                         for e in pack["entry"]],
               "stages": {st: {k: p[k] for k in STAGE_STATIC if k in p}
                          for st, p in pack["stages"].items()}}
    return arrs, statics


def merge_pack(arrs, statics):
    return {"entry": [dict(a, **s) for a, s in
                      zip(arrs["entry"], statics["entry"])],
            "stages": {st: dict(arrs["stages"][st], **statics["stages"][st])
                       for st in arrs["stages"]}}
