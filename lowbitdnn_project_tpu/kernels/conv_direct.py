"""Direct (implicit-GEMM) Pallas int8 conv kernel — the flagship 3x3 path.

TPU-native successor of the reference's WMMA tensor-core kernel
(cpp/int8conv/conv2DForward3x3TensorCores.cuh): where the CUDA kernel stages
a 34x34 halo tile + weights in shared memory and ladders WMMA fragments, this
kernel DMAs a (bh+halo) row-slab of the NHWC int8 input from HBM into VMEM,
builds the KHxKW-tap patch matrix *in VMEM* (implicit im2col — no HBM
blowup), and feeds the MXU one (bh*OW, KH*KW*C) x (KH*KW*C, K) int8 matmul
with int32 accumulation, with the dequant+bias+ReLU epilogue fused before
the store (reference alpha-trick, conv2d.cuh:147-155).

Supported: stride 1, any odd kernel, pre-padded input (pad in XLA, it's one
cheap int8 memset+copy). Stride-2 convs route through space-to-depth
(ops/conv.py) or XLA. Weight layout: HWIO reshaped to (KH*KW*C, K) — rows
ordered (kh, kw, c) to match the in-VMEM patch concat order.
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


def _conv_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_scale_ref, out_ref,
                 x_vmem, sem, *, bh: int, oh: int, ow: int, kh: int, kw: int,
                 c: int, relu: bool, requant: bool):
    """Grid: (N, OH/bh, K/bk). Block refs:
    x_hbm: full (N, OH+kh-1, OW+kw-1, C) padded input, ANY/HBM.
    w_ref: (KH*KW*C, bk) VMEM.  scale/bias: (1, bk) VMEM.
    out_ref: (1, bh, OW, bk) VMEM block.  x_vmem: (bh+kh-1, OW+kw-1, C) scratch.
    """
    n = pl.program_id(0)
    i = pl.program_id(1)

    rows = bh + kh - 1
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n, 1), pl.ds(i * bh, rows)], x_vmem, sem)
    dma.start()
    dma.wait()

    slab = x_vmem[0]                                   # (rows, OW+kw-1, C)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            taps.append(
                jax.lax.slice(slab, (dy, dx, 0), (dy + bh, dx + ow, c))
                .reshape(bh * ow, c))
    patches = jnp.concatenate(taps, axis=-1)           # (bh*OW, KH*KW*C)

    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[:]
    out = out + bias_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    if requant:
        inv = 1.0 / out_scale_ref[0]
        out = jnp.clip(jnp.round(out * inv), -127.0, 127.0)
    out_ref[:] = out.reshape(1, bh, ow, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "padding", "relu", "requant", "out_dtype",
                     "bh", "bk", "interpret"),
)
def conv2d_direct_int8(
    x: jax.Array,                # (N, H, W, C) int8, NOT padded
    w: jax.Array,                # (KH, KW, C, K) int8
    scale: jax.Array,            # (K,) f32 combined in*w scale
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
    bk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Stride-1 int8 conv with fused epilogue. Returns (N, OH, OW, K)."""
    n, h, wd, c = x.shape
    kh_, kw_, c_, k = w.shape
    assert (kh_, kw_) == (kh, kw) and c_ == c
    oh = h + 2 * padding - kh + 1
    ow = wd + 2 * padding - kw + 1

    bh = min(bh, oh)
    # grid rows must tile OH exactly; shrink bh to a divisor of OH
    while oh % bh:
        bh -= 1
    bk = min(_round_up(k, 128), bk)

    kp = _round_up(k, bk)
    if kp != k:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, kp - k)))

    # pad spatially for the conv; right-pad width to 8-sublane alignment so
    # the manual HBM->VMEM slab DMA slice is tiling-aligned (Mosaic requires
    # the second-to-minor slice dim to be a multiple of 8)
    w_slab = _round_up(ow + kw - 1, 8)
    x_p = jnp.pad(x, ((0, 0), (padding, padding),
                      (padding, w_slab - (wd + padding)), (0, 0)))

    wmat = w.reshape(kh * kw * c, kp)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1), (k,))
    scale = jnp.pad(scale, (0, kp - k)).reshape(1, kp)
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)
    bias = jnp.pad(jnp.asarray(bias, jnp.float32), (0, kp - k)).reshape(1, kp)
    if out_scale is None:
        out_scale = jnp.ones((), jnp.float32)
    out_scale = jnp.asarray(out_scale, jnp.float32).reshape(1)

    grid = (n, oh // bh, kp // bk)
    out_elem = jnp.int8 if requant else out_dtype

    kernel = functools.partial(
        _conv_kernel, bh=bh, oh=oh, ow=ow, kh=kh, kw=kw, c=c,
        relu=relu, requant=requant)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x stays in HBM
            pl.BlockSpec((kh * kw * c, bk), lambda n, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda n, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda n, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, ow, bk), lambda n, i, j: (n, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, kp), out_elem),
        scratch_shapes=[
            pltpu.VMEM((1, bh + kh - 1, w_slab, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
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
