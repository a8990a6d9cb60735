"""Weight-streaming downsample block: manual DMA overlap for the one-shot
loads the grid pipeline can't hide.

The resident chain's stage kernels stream per-block weights through
grid-indexed BlockSpecs — Pallas double-buffers those automatically. The
DOWNSAMPLE blocks are single-dispatch kernels: their whole weight set
(ds4: 5.75 MB int8 / 2.9 MB nibble-packed) transfers serially BEFORE any
compute starts, which round 3 measured as ds4's floor (15.4 us ≈ 7 us
one-shot load + fixed). This kernel takes the weights in ANY (HBM) memory
space and issues per-matrix async copies in USE ORDER (w1 first, wp last),
so the input row-packing and conv1/conv2 compute overlap the tail of the
weight traffic — the K-tiled-streaming lever from the round-3 TODO.

``packed=True`` composes with kernels/resident_w4a8.py: the streamed bytes
are nibble-packed int4 (half the traffic), sign-extended on the VPU after
each wait.

Reference parity anchor: the double-duty-warps smem load of
cpp/int8conv/conv2DForward3x3TensorCores.cuh:599-634 (load-compute overlap
inside one kernel), re-expressed as TPU async DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
    _unpack_rows as unpack_nib,
)
from lowbitdnn_project_tpu.kernels.resident_chain import _pack_rows
from lowbitdnn_project_tpu.kernels.stage_resident import (
    ResidentMeta, resident_live_mask,
)


def _stage_stream_kernel(x_ref, w1_ref, w2_ref, w3_ref,
                         s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                         sc_ref, mask_ref, out_ref,
                         carry, y1_ref, w1v, w2v, w3v, sems,
                         *, g8, bm, c, cmid, nblk, meta):
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        _chunks, _pack_rows, _unpack_rows)

    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    # start EVERY block's weight copies up front, in use order: the DMA
    # queue drains w1[0] first (the only copy anything waits on before
    # compute starts) and the rest stream behind the matmuls. This is the
    # K-tiled-streaming lever vs the grid version (stage_nhwc_resident),
    # whose step-0 prologue serializes the whole first block's 1+2.25+1
    # weight matrices before any compute.
    dmas = []
    for blk in range(nblk):
        for j, (src, dst, rows) in enumerate((
                (w1_ref, w1v, c), (w2_ref, w2v, 9 * cmid),
                (w3_ref, w3v, cmid))):
            d = pltpu.make_async_copy(
                src.at[blk * rows:(blk + 1) * rows, :],
                dst.at[blk * rows:(blk + 1) * rows, :],
                sems.at[blk, j])
            d.start()
            dmas.append(d)

    _pack_rows(carry, x_ref, meta)       # overlaps the w1[0] copy

    for blk in range(nblk):
        dmas[3 * blk + 0].wait()
        w1 = w1v[blk * c:(blk + 1) * c, :]
        for r0, r1 in _chunks(0, meta.u):
            acc1 = jnp.dot(carry[r0:r1, :], w1,
                           preferred_element_type=jnp.int32)
            h1 = jnp.maximum(
                acc1.astype(jnp.float32) * s1_ref[blk] + b1_ref[blk], 0.0)
            q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[blk, 0])),
                          -127.0, 127.0)
            y1_ref[r0:r1, :] = jnp.where(mask_ref[r0:r1] != 0, q1,
                                         0.0).astype(jnp.int8)

        dmas[3 * blk + 1].wait()
        w3 = None
        for r0, r1 in _chunks(g8, g8 + bm):
            n = r1 - r0
            acc2 = None
            for t, off in enumerate(offsets):
                d2 = jnp.dot(
                    y1_ref[r0 + off:r0 + off + n, :],
                    w2v[blk * 9 * cmid + t * cmid:
                        blk * 9 * cmid + (t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
                acc2 = d2 if acc2 is None else acc2 + d2
            h2 = jnp.maximum(
                acc2.astype(jnp.float32) * s2_ref[blk] + b2_ref[blk], 0.0)
            y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[blk, 1])),
                          -127.0, 127.0).astype(jnp.int8)
            if w3 is None:
                # lazy: conv1+conv2 of this block overlapped the w3 tail
                dmas[3 * blk + 2].wait()
                w3 = w3v[blk * cmid:(blk + 1) * cmid, :]
            acc3 = jnp.dot(y2, w3, preferred_element_type=jnp.int32)
            h3 = acc3.astype(jnp.float32) * s3_ref[blk] + b3_ref[blk]
            identity = carry[r0:r1, :].astype(jnp.float32) * sc_ref[blk, 2]
            out = jnp.maximum(h3 + identity, 0.0)
            q = jnp.clip(jnp.round(out * (1.0 / sc_ref[blk, 3])),
                         -127.0, 127.0)
            carry[r0:r1, :] = jnp.where(
                mask_ref[r0:r1, :] != 0, q, 0.0).astype(jnp.int8)

    _unpack_rows(out_ref, carry[:], meta)


@functools.partial(jax.jit, static_argnames=("meta", "nblk", "interpret"))
def stage_nhwc_resident_stream(
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
    """stage_nhwc_resident with use-order DMA weight streaming.

    The grid twin's (kernels/resident_chain.py:stage_nhwc_resident)
    prologue loads block 0's ENTIRE weight set (l4: 4.4 MB) before any
    compute; here all nblk*3 matrices stream in use order, so compute
    starts after only w1[0] (l4: 1 MB) and everything later overlaps the
    matmuls — the round-3 K-tiled-streaming TODO. Bit-identical to the
    grid twin (same arithmetic, same order). cmid must exceed 64 (the
    single-dot small-cmid formulation is not expressed here)."""
    n, h, w, c = x.shape
    cmid = w1.shape[1]
    assert cmid > 64, "stream stage kernel: cmid>64 shapes only"
    assert w1.shape == (nblk * c, cmid)
    assert w2.shape == (nblk * 9 * cmid, cmid)
    assert w3.shape == (nblk * cmid, c)
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    anyspace = pl.BlockSpec(memory_space=pltpu.ANY)
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_stage_stream_kernel, g8=g8, bm=bm, c=c,
                               cmid=cmid, nblk=nblk, meta=meta)
    scratch = [
        pltpu.VMEM((meta.u, c), jnp.int8),        # carry
        pltpu.VMEM((meta.u, cmid), jnp.int8),     # y1
        pltpu.VMEM(w1.shape, w1.dtype),
        pltpu.VMEM(w2.shape, w2.dtype),
        pltpu.VMEM(w3.shape, w3.dtype),
        pltpu.SemaphoreType.DMA((nblk, 3)),
    ]
    return pl.pallas_call(
        kernel,
        in_specs=[full] + [anyspace] * 3 + [full] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w1, w2, w3,
      s1.astype(jnp.float32)[:, None], b1.astype(jnp.float32)[:, None],
      s2.astype(jnp.float32)[:, None], b2.astype(jnp.float32)[:, None],
      s3.astype(jnp.float32)[:, None], b3.astype(jnp.float32)[:, None],
      jnp.asarray(chain_scales, jnp.float32), mask)


def _ds_stream_kernel(xf_ref, w1_ref, w2a_ref, w2b_ref, w3_ref, wp_ref,
                      s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                      sp_ref, bp_ref, sc_ref, mask_ref, out_ref,
                      xs, h1f, qbuf, w1v, w2av, w2bv, w3v, wpv, sems,
                      g8, bm, cin, cmid, meta, out_meta, packed):
    from lowbitdnn_project_tpu.kernels.resident_chain import _chunks

    # start every weight copy up front, in use order (the DMA engine
    # drains them while the VPU packs rows / the MXU runs conv1-2)
    dmas = [pltpu.make_async_copy(src, dst, sems.at[i])
            for i, (src, dst) in enumerate(
                [(w1_ref, w1v), (w2a_ref, w2av), (w2b_ref, w2bv),
                 (w3_ref, w3v), (wp_ref, wpv)])]
    for d in dmas:
        d.start()

    _pack_rows(xs, xf_ref, meta)        # overlaps the in-flight copies

    dmas[0].wait()
    w1 = unpack_nib(w1v[:]) if packed else w1v[:]
    for half in (0, 1):
        for r0, r1 in _chunks(0, meta.u):
            acc1 = jnp.dot(xs[r0:r1, half * cin:(half + 1) * cin], w1,
                           preferred_element_type=jnp.int32)
            h1 = jnp.maximum(
                acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
            q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
            h1f[r0:r1, half * cmid:(half + 1) * cmid] = jnp.where(
                mask_ref[r0:r1] != 0, q1, 0.0).astype(jnp.int8)

    dmas[1].wait()
    dmas[2].wait()
    step_a = cmid if packed else 2 * cmid
    step_b = cmid // 2 if packed else cmid
    was, wbs = [], []
    for t in range(3):
        wa = w2av[t * step_a:(t + 1) * step_a, :]
        wb = w2bv[t * step_b:(t + 1) * step_b, :]
        if packed:
            wa, wb = unpack_nib(wa), unpack_nib(wb)
        was.append(wa)
        wbs.append(wb)
    w3 = wp = None
    for r0, r1 in _chunks(g8, g8 + bm):
        n = r1 - r0
        acc2 = None
        for t, dy in enumerate((-1, 0, 1)):
            off = dy * meta.pitch
            da = jnp.dot(h1f[r0 + off:r0 + off + n, :], was[t],
                         preferred_element_type=jnp.int32)
            db = jnp.dot(h1f[r0 + off - 1:r0 + off - 1 + n, cmid:], wbs[t],
                         preferred_element_type=jnp.int32)
            d = da + db
            acc2 = d if acc2 is None else acc2 + d
        h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:],
                         0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                      ).astype(jnp.int8)
        if w3 is None:
            # lazy wait: conv2 of the first chunk overlaps the w3/wp tail
            dmas[3].wait()
            w3 = unpack_nib(w3v[:]) if packed else w3v[:]
            dmas[4].wait()
            wp = unpack_nib(wpv[:]) if packed else wpv[:]

        acc3 = jnp.dot(y2, w3, preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
        accp = jnp.dot(xs[r0:r1, :cin], wp,
                       preferred_element_type=jnp.int32)
        proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
        out = jnp.maximum(h3 + proj, 0.0)
        qbuf[r0 - g8:r1 - g8, :] = jnp.clip(
            jnp.round(out * (1.0 / sc_ref[2])), -127.0, 127.0
        ).astype(jnp.int8)
    for img in range(out_meta.n):
        for hh in range(out_meta.h):
            r = meta.g8 + img * meta.seg + (2 * hh) * meta.pitch - g8
            out_ref[img, hh] = qbuf[r:r + out_meta.w, :]


@functools.partial(jax.jit, static_argnames=("meta", "out_meta", "packed",
                                             "interpret"))
def block_ds_resident_stream(
    xf: jax.Array,               # (N, H, W/2, 2*Cin) int8, fold_w output
    w1: jax.Array,               # (Cin, Cmid) int8 | (Cin/2, Cmid) uint8
    w2a: jax.Array,              # (3*2*Cmid, Cmid) | (3*Cmid, Cmid) packed
    w2b: jax.Array,              # (3*Cmid, Cmid) | (3*Cmid/2, Cmid) packed
    w3: jax.Array,               # (Cmid, Cout) | (Cmid/2, Cout) packed
    wp: jax.Array,               # (Cin, Cout) | (Cin/2, Cout) packed
    s1, b1, s2, b2, s3, b3, sp, bp,
    chain_scales: jax.Array,     # (3,) [y1s, y2s, out_s]
    *,
    meta: ResidentMeta,          # FOLDED geometry: (n, h, w//2)
    out_meta: ResidentMeta,      # output geometry: (n, h//2, w//2)
    packed: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """block_ds_resident with weights DMA-streamed from HBM in use order
    (overlapping the row-pack + conv1/conv2 compute). packed=True streams
    nibble-packed int4 bytes (kernels/resident_w4a8.py layouts)."""
    n, h, w2v, cin2 = xf.shape
    cin = cin2 // 2
    cmid = w2a.shape[1]
    cout = w3.shape[1]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    anyspace = pl.BlockSpec(memory_space=pltpu.ANY)
    full = pl.BlockSpec(memory_space=vm)
    kernel = functools.partial(_ds_stream_kernel, g8=g8, bm=bm, cin=cin,
                               cmid=cmid, meta=meta, out_meta=out_meta,
                               packed=packed)
    scratch = [
        pltpu.VMEM((meta.u, 2 * cin), jnp.int8),
        pltpu.VMEM((meta.u, 2 * cmid), jnp.int8),
        pltpu.VMEM((bm, cout), jnp.int8),
        pltpu.VMEM(w1.shape, w1.dtype),
        pltpu.VMEM(w2a.shape, w2a.dtype),
        pltpu.VMEM(w2b.shape, w2b.dtype),
        pltpu.VMEM(w3.shape, w3.dtype),
        pltpu.VMEM(wp.shape, wp.dtype),
        pltpu.SemaphoreType.DMA((5,)),
    ]
    return pl.pallas_call(
        kernel,
        in_specs=[full] + [anyspace] * 5 + [full] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(
            (out_meta.n, out_meta.h, out_meta.w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xf, w1, w2a, w2b, w3, wp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)
