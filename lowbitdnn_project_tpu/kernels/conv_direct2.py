"""Direct Pallas int8 conv, generation 2: double-buffered halo DMA.

Evolution of kernels/conv_direct.py (the reference's kernel-lab v1->v6
pattern, custom2DConvolution.cuh): v1 re-DMAs the input slab for every
K-block and stalls on every DMA; v2 (this file) flattens the grid to one
dimension, keeps the full K in VMEM (K <= 512 covers every ResNet 3x3
layer), and prefetches the next row-slab into the alternate buffer while
computing the current one — the TPU analogue of the CUDA kernel's
smem double-buffering.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, out_scale_ref, out_ref,
            x_vmem, sems, *, bh: int, nblocks: int, total: int, oh: int,
            ow: int, kh: int, kw: int, c: int, relu: bool, requant: bool):
    idx = pl.program_id(0)
    rows = bh + kh - 1

    def dma(slot, step):
        n = step // nblocks
        i = step % nblocks
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(n, 1), pl.ds(i * bh, rows)],
            x_vmem.at[pl.ds(slot, 1)], sems.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _first():
        dma(0, 0).start()

    @pl.when(idx + 1 < total)
    def _prefetch():
        dma((idx + 1) % 2, idx + 1).start()

    dma(slot, idx).wait()

    slab = x_vmem[slot]                               # (rows, w_slab, C)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            taps.append(
                jax.lax.slice(slab, (dy, dx, 0), (dy + bh, dx + ow, c))
                .reshape(bh * ow, c))
    patches = jnp.concatenate(taps, axis=-1)

    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[:]
    out = out + bias_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    if requant:
        out = jnp.clip(jnp.round(out * (1.0 / out_scale_ref[0])),
                       -127.0, 127.0)
    out_ref[:] = out.reshape(1, bh, ow, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "padding", "relu", "requant", "out_dtype",
                     "bh", "interpret"),
)
def conv2d_direct_v2(
    x: jax.Array,                # (N, H, W, C) int8, C % 128 == 0
    w: jax.Array,                # (KH, KW, C, K) int8
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
    *,
    kh: int = 3,
    kw: int = 3,
    padding: int = 1,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
    bh: int = 8,
    interpret: bool = False,
) -> jax.Array:
    n, h, wd, c = x.shape
    kh_, kw_, c_, k = w.shape
    assert (kh_, kw_, c_) == (kh, kw, c)
    oh = h + 2 * padding - kh + 1
    ow = wd + 2 * padding - kw + 1
    kp = _round_up(k, 128)
    if kp != k:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, kp - k)))

    bh = min(bh, oh)
    while oh % bh:
        bh -= 1
    nblocks = oh // bh
    total = n * nblocks

    w_slab = _round_up(ow + kw - 1, 8)
    x_p = jnp.pad(x, ((0, 0), (padding, padding),
                      (padding, w_slab - (wd + padding)), (0, 0)))
    wmat = w.reshape(kh * kw * c, kp)
    scale = jnp.pad(jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(-1), (k,)),
        (0, kp - k)).reshape(1, kp)
    bias = jnp.zeros((k,), jnp.float32) if bias is None else bias
    bias = jnp.pad(jnp.asarray(bias, jnp.float32), (0, kp - k)).reshape(1, kp)
    out_scale = (jnp.ones((), jnp.float32) if out_scale is None
                 else jnp.asarray(out_scale, jnp.float32)).reshape(1)

    kernel = functools.partial(
        _kernel, bh=bh, nblocks=nblocks, total=total, oh=oh, ow=ow,
        kh=kh, kw=kw, c=c, relu=relu, requant=requant)
    out_elem = jnp.int8 if requant else out_dtype

    out = pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kh * kw * c, kp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, ow, kp),
            lambda t, nb=nblocks: (t // nb, t % nb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, kp), out_elem),
        scratch_shapes=[
            pltpu.VMEM((2, bh + kh - 1, w_slab, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow * kh * kw * c * kp,
            bytes_accessed=n * h * wd * c + kh * kw * c * kp
            + n * oh * ow * kp * (1 if requant else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, wmat, scale, bias, out_scale)

    if kp != k:
        out = out[..., :k]
    return out
