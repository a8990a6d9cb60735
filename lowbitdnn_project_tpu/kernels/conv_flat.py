"""Direct-conv generation v3: the *flat pitched layout* kernel.

The third generation of the kernel-lab's direct conv line (after
conv_direct.py v1 and conv_direct2.py v2), replacing the reference's
v1..v6 CUDA evolution (cpp/apps/custom_convolution/custom2DConvolution.cuh)
with a layout-first TPU design.

v1/v2 lost to XLA because the in-VMEM patch build dominates: each of the
KH*KW taps needs a (bh, ow, C) -> (bh*ow, C) reshape (a sublane relayout,
since OW is not the VMEM row pitch) plus a 9-way concat before the MXU sees
anything.  v3 removes the patch build entirely by changing the *memory
layout* of activations so that a conv tap is a constant row offset:

  flat pitched layout (one 2D int8 array per activation tensor):
    pitch P = W + 1            one shared zero column terminates every row
                               (right-pad of row h == left-pad of row h+1)
    seg   = (H + 1) * P        one shared zero row terminates every image
                               (bottom-pad of image n == top-pad of image n+1)
    element (n, h, w)  ->  row MARGIN + LEAD + n*seg + h*P + w
    LEAD  = round_up(P + 1, 8) zero rows ahead of image 0 (top pad + the
                               (dy,dx)=(-1,-1) corner tap of element (0,0,0))
    MARGIN= 1024               rows of *don't-care* at both ends so any
                               block size dividing 1024 can halo-DMA without
                               bounds checks; never read by live outputs

  With every pad element physically present (and zero), tap (dy, dx) of ANY
  live output row u is exactly input row u + dy*P + dx — for all images in
  the batch at once.  A KHxKW conv therefore becomes KH*KW accumulated
  (BM, C) x (C, BK) MXU matmuls on *static offset slices* of one VMEM slab:
  no im2col, no reshapes, no concat, no per-image logic.  The epilogue
  (dequant+bias+ReLU+requant) is fused, and a precomputed live-row mask
  re-zeroes the pad positions so the invariant survives layer to layer —
  chains of convs run entirely in this layout with zero relayout passes.

The cost is computing the pad rows/columns too: overhead (H+1)(W+1)/(H*W)
(56²: 3.6%, 28²: 7.3%, 14²: 14.8%).  The win is that the MXU never waits
on a patch build.  Measured numbers vs XLA's conv emitters live in
bench_results_r2.json (conv3x3 grids, config "flat_pallas").

Reference parity: this is the TPU answer to the reference's
custom2DConvolution.cuh v5/v6 ("no atomics, full in-block accumulation",
:39-715) — the generation that finally beat cuDNN — and to its smem layout
search (cpp/asd.py): the layout is chosen so the hot loop is pure MXU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MARGIN = 1024  # rows of don't-care at each end of the flat array


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


class FlatMeta(NamedTuple):
    """Geometry of one flat pitched activation layout."""
    n: int
    h: int
    w: int
    pad: int        # supports kernels up to (2*pad+1) x (2*pad+1)
    pitch: int      # W + pad (shared zero columns)
    seg: int        # (H+pad) * pitch (shared zero rows)
    lead: int       # zero rows ahead of image 0
    l_real: int     # lead + n*seg  (live region, rows [MARGIN, MARGIN+l_real))
    l_pad: int      # l_real rounded up to a 1024 multiple
    u: int          # total rows = l_pad + 2*MARGIN


def flat_meta(n: int, h: int, w: int, pad: int = 1) -> FlatMeta:
    pitch = w + pad
    seg = (h + pad) * pitch
    lead = _round_up(pad * pitch + pad, 8)
    l_real = lead + n * seg
    l_pad = _round_up(l_real, MARGIN)
    return FlatMeta(n, h, w, pad, pitch, seg, lead, l_real, l_pad,
                    l_pad + 2 * MARGIN)


def to_flat(x: jax.Array, meta: Optional[FlatMeta] = None) -> jax.Array:
    """(N, H, W, C) NHWC -> (U, C) flat pitched layout (pure XLA pad+reshape)."""
    n, h, w, c = x.shape
    m = meta or flat_meta(n, h, w)
    body = jnp.pad(x, ((0, 0), (0, m.pad), (0, m.pad), (0, 0)))
    body = body.reshape(n * m.seg, c)
    return jnp.pad(body, ((MARGIN + m.lead, m.u - MARGIN - m.l_real), (0, 0)))


def from_flat(xf: jax.Array, meta: FlatMeta) -> jax.Array:
    """(U, C) flat -> (N, H, W, C), dropping pad rows/cols."""
    c = xf.shape[-1]
    body = jax.lax.slice(
        xf, (MARGIN + meta.lead, 0), (MARGIN + meta.l_real, c))
    body = body.reshape(meta.n, meta.h + meta.pad, meta.pitch, c)
    return body[:, :meta.h, :meta.w, :]


def live_mask(meta: FlatMeta) -> np.ndarray:
    """(l_pad, 1) int8: 1 on live (n,h,w) rows, 0 on pad/lead/tail rows."""
    mask = np.zeros((meta.l_pad, 1), np.int8)
    rows = np.arange(meta.n * meta.seg)
    live = ((rows % meta.pitch) < meta.w) & \
           ((rows // meta.pitch) % (meta.h + meta.pad) < meta.h)
    mask[meta.lead:meta.lead + rows.size, 0] = live
    return mask


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, os_ref, mask_ref, out_ref,
            slab, *rest, offsets: Tuple[int, ...], g8: int, bm: int, c: int,
            relu: bool, requant: bool, single_dot: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    sem = rest[-1]

    @pl.when(j == 0)
    def _load_slab():
        start = MARGIN + i * bm - g8
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, bm + 2 * g8), :], slab, sem)
        dma.start()
        dma.wait()

    if single_dot:
        # materialize the shifted taps once (sublane-rotated copies), then
        # contract all KH*KW*C at once on the MXU — no int32 partial adds
        patches = rest[0]

        @pl.when(j == 0)
        def _build_patches():
            for t, off in enumerate(offsets):
                patches[:, t * c:(t + 1) * c] = \
                    slab[g8 + off:g8 + off + bm, :]

        acc = jnp.dot(patches[:], w_ref[:],
                      preferred_element_type=jnp.int32)
    else:
        acc = None
        for t, off in enumerate(offsets):
            lhs = slab[g8 + off:g8 + off + bm, :]
            d = jnp.dot(lhs, w_ref[t * c:(t + 1) * c, :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d

    out = acc.astype(jnp.float32) * scale_ref[:]
    out = out + bias_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    live = mask_ref[:] != 0                      # (bm, 1) -> broadcast
    if requant:
        inv = 1.0 / os_ref[0]
        q = jnp.clip(jnp.round(out * inv), -127.0, 127.0)
        out_ref[:] = jnp.where(live, q, 0.0).astype(jnp.int8)
    else:
        out_ref[:] = jnp.where(live, out, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "kh", "kw", "relu", "requant", "out_dtype",
                     "bm", "bk", "single_dot", "interpret"),
)
def conv_flat_int8(
    xf: jax.Array,               # (U, C) int8 flat pitched layout
    w: jax.Array,                # (KH, KW, C, K) int8, pad=(KH//2, KW//2)
    scale: jax.Array,            # (K,) f32 combined in*w scale
    bias: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
    *,
    meta: FlatMeta,
    kh: int = 3,
    kw: int = 3,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
    bm: int = 512,
    bk: Optional[int] = None,
    single_dot: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """'Same'-padded stride-1 conv entirely in the flat pitched layout.

    Returns (U, K) int8 (requant) or out_dtype.  Output live rows hold the
    conv result; pad rows/cols are zeroed (layout invariant); MARGIN rows
    are unspecified.
    """
    u, c = xf.shape
    kh_, kw_, c_, k = w.shape
    assert (kh_, kw_, c_) == (kh, kw, c), (w.shape, (kh, kw, c))
    assert u == meta.u, (u, meta)
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernel only"
    assert kh // 2 <= meta.pad and kw // 2 <= meta.pad, \
        f"{kh}x{kw} taps need a pad>={max(kh, kw) // 2} layout, got {meta.pad}"
    assert MARGIN % bm == 0, (bm,)
    # int8 DMA slices need the minor dim 128-aligned (Mosaic tiling); C<128
    # shapes would also halve MXU contraction utilization — route them to XLA
    assert c % 128 == 0, f"flat kernel needs C%128==0, got C={c}"

    offsets = tuple(dy * meta.pitch + dx
                    for dy in range(-(kh // 2), kh // 2 + 1)
                    for dx in range(-(kw // 2), kw // 2 + 1))
    g8 = _round_up(max(abs(o) for o in offsets) or 8, 8)

    bk = bk or min(_round_up(k, 128), 512)
    kp = _round_up(k, bk)
    if kp != k:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, kp - k)))
    wmat = w.reshape(kh * kw * c, kp)

    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1), (k,))
    scale = jnp.pad(scale, (0, kp - k)).reshape(1, kp)
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)
    bias = jnp.pad(jnp.asarray(bias, jnp.float32), (0, kp - k)).reshape(1, kp)
    if out_scale is None:
        out_scale = jnp.ones((), jnp.float32)
    out_scale = jnp.asarray(out_scale, jnp.float32).reshape(1)

    mask = jnp.asarray(live_mask(meta))          # (l_pad, 1) int8

    nm = meta.l_pad // bm
    nj = kp // bk
    mb = MARGIN // bm
    grid = (nm, nj)

    kernel = functools.partial(
        _kernel, offsets=offsets, g8=g8, bm=bm, c=c,
        relu=relu, requant=requant, single_dot=single_dot)

    out_elem = jnp.int8 if requant else out_dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x stays in HBM
            pl.BlockSpec((kh * kw * c, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda i, j: (i + mb, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((meta.u, kp), out_elem),
        scratch_shapes=(
            [pltpu.VMEM((bm + 2 * g8, c), jnp.int8)]
            + ([pltpu.VMEM((bm, kh * kw * c), jnp.int8)] if single_dot else [])
            + [pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.l_pad * kh * kw * c * kp,
            bytes_accessed=meta.u * c + kh * kw * c * kp
            + meta.l_pad * kp * (1 if requant else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wmat, scale, bias, out_scale, mask)

    if kp != k:
        out = out[:, :k]
    return out
