"""Fused ResNet bottleneck block in the flat pitched layout.

One Pallas kernel runs an ENTIRE stride-1 bottleneck residual block —
  y1 = requant(relu(x @ W1 * s1 + b1))             (1x1, C -> Cmid)
  y2 = requant(relu(conv3x3(y1) * s2 + b2))        (3x3, Cmid -> Cmid)
  out = requant(relu(y2 @ W3 * s3 + b3 + x * xs))  (1x1 + residual add)
— with all three weight matrices resident in VMEM and the intermediate
activations never leaving the chip.  Versus three separate convs this
removes two full HBM round-trips of the mid activations plus two epilogue
read/write passes, attacking the measured ~20%/conv requant overhead and
the inter-conv bandwidth that dominate ResNet-50 layers 2-4 (BENCH_NOTES
round-1 roofline gaps).

Works because of the flat pitched layout (kernels/conv_flat.py): the 3x3
taps of conv2 are constant row offsets, so the block needs only a halo of
G8 rows of y1, recomputed locally from a (BM + 2*G8)-row input slab — the
TPU equivalent of the reference's persistent-smem tiling idea taken across
THREE convs instead of one (cpp/apps/custom_convolution/custom2DConvolution.cuh
v5/v6 in-block accumulation; check.cu specialized-shape ethos).

Numerics are the engine's standard int8 chain with float-domain residual
add (models/resnet.py apply_quantized_int8chain, add_domain="float"),
computed in f32 inside the kernel.

Reference parity anchors: python/qtorch/nn/functional/qconv2d.py:49-71
(int8 conv + fused scale epilogue), python/df-optimization/Int8Conv2d.py
(pure-int8 chain semantics).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.conv_flat import (
    MARGIN, FlatMeta, _cdiv, _round_up, live_mask,
)


def _kernel(x_hbm, w1_ref, w2_ref, w3_ref,
            s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
            sc_ref, mask_prev, mask_cur, mask_next, out_ref,
            slab, y1_ref, y2_ref, sem,
            *, offsets: Tuple[int, ...], g8: int, bm: int,
            c: int, cmid: int):
    i = pl.program_id(0)

    start = MARGIN + i * bm - g8
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, bm + 2 * g8), :], slab, sem)
    dma.start()
    dma.wait()

    # conv1 (1x1) over the extended rows so conv2's taps have their halo;
    # pad rows must come out exactly 0 (the layout invariant): mask with
    # the live-row window [m0-g8, m0+bm+g8) stitched from 3 mask blocks.
    mext = jnp.concatenate(
        [mask_prev[bm - g8:], mask_cur[:], mask_next[:g8]], axis=0)
    acc1 = jnp.dot(slab[:], w1_ref[:], preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
    q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
    y1_ref[:] = jnp.where(mext != 0, q1, 0.0).astype(jnp.int8)

    # conv2 (3x3) as tap-offset matmuls on y1
    acc2 = None
    for t, off in enumerate(offsets):
        lhs = y1_ref[g8 + off:g8 + off + bm, :]
        d = jnp.dot(lhs, w2_ref[t * cmid:(t + 1) * cmid, :],
                    preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    y2_ref[:] = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                         ).astype(jnp.int8)

    # conv3 (1x1) + residual add (float domain) + relu + requant
    acc3 = jnp.dot(y2_ref[:], w3_ref[:], preferred_element_type=jnp.int32)
    h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
    identity = slab[g8:g8 + bm, :].astype(jnp.float32) * sc_ref[2]
    out = jnp.maximum(h3 + identity, 0.0)
    q = jnp.clip(jnp.round(out * (1.0 / sc_ref[3])), -127.0, 127.0)
    out_ref[:] = jnp.where(mask_cur[:] != 0, q, 0.0).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "bm", "interpret"),
)
def bottleneck_flat_int8(
    xf: jax.Array,               # (U, C) int8 flat pitched layout
    w1: jax.Array,               # (C, Cmid) int8       1x1 reduce
    w2: jax.Array,               # (3, 3, Cmid, Cmid) int8
    w3: jax.Array,               # (Cmid, C) int8       1x1 expand
    scales: jax.Array,           # (4,) f32: [y1_scale, y2_scale, x_scale,
                                 #            out_scale] (requant chain)
    s1: jax.Array, b1: jax.Array,   # (Cmid,) combined scale / bias, conv1
    s2: jax.Array, b2: jax.Array,   # (Cmid,) conv2
    s3: jax.Array, b3: jax.Array,   # (C,)    conv3
    *,
    meta: FlatMeta,
    bm: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Whole bottleneck block, flat in / flat out (U, C) int8."""
    u, c = xf.shape
    c_, cmid = w1.shape
    assert c_ == c and w2.shape == (3, 3, cmid, cmid) \
        and w3.shape == (cmid, c), (w1.shape, w2.shape, w3.shape)
    assert u == meta.u and meta.pad >= 1, (u, meta)
    assert MARGIN % bm == 0, (bm,)

    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8 = _round_up(meta.pitch + 1, 8)
    assert g8 <= bm

    w2m = w2.reshape(9 * cmid, cmid)

    def vec(v, n):
        return jnp.broadcast_to(
            jnp.asarray(v, jnp.float32).reshape(-1), (n,)).reshape(1, n)

    mask = jnp.asarray(live_mask(meta))          # (l_pad, 1) int8
    # pad one block of zeros each side so the i-1 / i+1 mask windows exist
    maskp = jnp.pad(mask, ((bm, bm), (0, 0)))

    nm = meta.l_pad // bm
    mb = MARGIN // bm

    kernel = functools.partial(
        _kernel, offsets=offsets, g8=g8, bm=bm, c=c, cmid=cmid)

    out = pl.pallas_call(
        kernel,
        grid=(nm,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x stays in HBM
            pl.BlockSpec((c, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cmid, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),         # scales (4,)
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i + mb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((meta.u, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((bm + 2 * g8, c), jnp.int8),        # input slab
            pltpu.VMEM((bm + 2 * g8, cmid), jnp.int8),     # y1 (+halo)
            pltpu.VMEM((bm, cmid), jnp.int8),              # y2
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.l_pad * (c * cmid * 2 + 9 * cmid * cmid),
            bytes_accessed=meta.u * c * 2
            + (c * cmid * 2 + 9 * cmid * cmid),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, w1, w2m, w3,
      vec(s1, cmid), vec(b1, cmid), vec(s2, cmid), vec(b2, cmid),
      vec(s3, c), vec(b3, c),
      jnp.asarray(scales, jnp.float32).reshape(4),
      maskp, maskp, maskp)
    return out
