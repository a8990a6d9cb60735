"""Fully-fused Pallas Winograd F(2x2,3x3) int8 conv kernel.

The TPU twin of the reference's fused CUDA kernel
(cpp/int8conv/conv2DForward3x3WinogradFused.cuh): everything — input-tile
extraction, integer BᵀdB butterflies, transform-domain requantization, the
16 per-position matmuls, AᵀmA output transform, and the epilogue — happens
in VMEM within one kernel invocation; the transform domain never touches
HBM (which is why the JAX-level version in ops/winograd.py loses: its
(16, M, C) V tensors round-trip HBM).

Layout tricks:
  * tile extraction uses parity reshapes (rows -> (tile_row, parity)) so all
    16 taps are PLAIN slices — no strided slicing in VMEM;
  * V stays int16 ("exact" mode) or requants to int8 with the /4 scale
    (|BᵀdB| <= 4*127), reference's per-group scales idea;
  * the 16 matmuls run as one jax.lax.dot_general batch on the MXU.

Constraints: stride 1, pad 1, even H/W, C % 128 == 0 (DMA lane alignment),
K blocked by bk. Weights arrive pre-transformed (wino_quantize_filter).
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


def _wino_kernel(x_hbm, u_ref, uscale_ref, bias_ref, out_scale_ref, out_ref,
                 x_vmem, sem, *, bh: int, w: int, c: int, wh: int,
                 v_int8: bool, relu: bool, requant: bool):
    """Grid (N, H/bh, K/bk).
    x_hbm: (N, 2, 2, Hh, Wh, C) parity-split padded input — plane (a, b)
    holds x_padded[2t+a, 2s+b] (Mosaic supports neither stride-2 vector
    slices nor the 5-D parity reshape in-kernel, so the split happens once
    in XLA; measured ~6us).
    u_ref: (16, C, bk). uscale_ref: (16, 1, bk) f32 (includes the data-
    transform scale when v_int8). out (1, bh, w, bk)."""
    n = pl.program_id(0)
    i = pl.program_id(1)

    th, tw = bh // 2, w // 2
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n, 1), :, :, pl.ds(i * th, th + 1)], x_vmem, sem)
    dma.start()
    dma.wait()

    planes = x_vmem[0]                                # (2, 2, th+1, Wh, C)

    # d[i][j] (th*tw, C): padded-input pixel (2ty+i, 2tx+j) = plane
    # (i%2, j%2) at (ty + i//2, tx + j//2) — plain slices only.
    # Butterflies run in int32: int16 ADD/SUB crashes the TPU compiler's
    # LLO passes (SIGABRT, bisected); int16 casts are fine.
    def d(di, dj):
        return jax.lax.slice(
            planes, (di % 2, dj % 2, di // 2, dj // 2, 0),
            (di % 2 + 1, dj % 2 + 1, di // 2 + th, dj // 2 + tw, c),
        ).reshape(th * tw, c).astype(jnp.int32)

    dd = [[d(di, dj) for dj in range(4)] for di in range(4)]
    # Bᵀ d B integer butterfly: rows then columns
    r = [
        [dd[0][j] - dd[2][j] for j in range(4)],
        [dd[1][j] + dd[2][j] for j in range(4)],
        [dd[2][j] - dd[1][j] for j in range(4)],
        [dd[1][j] - dd[3][j] for j in range(4)],
    ]
    v = []
    for ri in r:
        v.extend([ri[0] - ri[2], ri[1] + ri[2], ri[2] - ri[1], ri[1] - ri[3]])
    vmat = jnp.stack(v)                               # (16, th*tw, C) int32

    if v_int8:
        # /4 keeps |V| within int8 (|BᵀdB| <= 508); folded into uscale
        vq = jnp.clip((vmat + 2) >> 2, -127, 127).astype(jnp.int8)
    else:
        vq = vmat.astype(jnp.int16)

    m = jax.lax.dot_general(
        vq, u_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)             # (16, th*tw, bk)
    mf = m.astype(jnp.float32) * uscale_ref[:]

    # Aᵀ m A float butterfly over the 16 positions
    mm = mf.reshape(4, 4, th * tw, -1)
    r0 = mm[0] + mm[1] + mm[2]
    r1 = mm[1] - mm[2] - mm[3]
    y00 = r0[0] + r0[1] + r0[2]
    y01 = r0[1] - r0[2] - r0[3]
    y10 = r1[0] + r1[1] + r1[2]
    y11 = r1[1] - r1[2] - r1[3]
    y = jnp.stack([y00, y01, y10, y11])               # (4, th*tw, bk)
    y = y + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    if requant:
        y = jnp.clip(jnp.round(y * (1.0 / out_scale_ref[0])), -127.0, 127.0)
    bk = y.shape[-1]
    y = y.reshape(2, 2, th, tw, bk).transpose(2, 0, 3, 1, 4)
    out_ref[:] = y.reshape(1, bh, w, bk).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "requant", "out_dtype", "bh", "bk", "v_int8",
                     "interpret"),
)
def conv3x3_winograd_fused(
    x: jax.Array,                  # (N, H, W, C) int8, H W even, C%128==0
    u: jax.Array,                  # (16, C, K) int8/int16 transformed filter
    u_scale: jax.Array,            # (16, 1, K) f32 (x_scale NOT included)
    x_scale: jax.Array,            # () f32 activation scale
    bias: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
    bh: int = 14,
    bk: int = 512,
    v_int8: bool = True,
    interpret: bool = False,
) -> jax.Array:
    n, h, w, c = x.shape
    _, c_, k = u.shape
    assert c_ == c and h % 2 == 0 and w % 2 == 0, (x.shape,)
    if not v_int8 and c > 3698:
        # exact mode: per-channel |V|*|U| <= 508*1143; int32 accumulation
        # over C could overflow beyond this
        raise ValueError(f"int16 winograd mode exact only for C<=3698, got {c}")

    bh = min(bh, h)
    while h % bh or bh % 2:
        bh -= 1
    bk = min(_round_up(k, 128), bk)
    kp = _round_up(k, bk)
    if kp != k:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, kp - k)))

    # parity-split the padded input in XLA: (N, 2, 2, Hh, Wh, C)
    hh = (h + 2) // 2
    wh = _round_up((w + 2) // 2, 8)
    x_p = jnp.pad(x, ((0, 0), (1, 1), (1, 2 * wh - w - 1), (0, 0)))
    x_p4 = x_p.reshape(n, hh, 2, wh, 2, c).transpose(0, 2, 4, 1, 3, 5)

    scale = jnp.asarray(u_scale, jnp.float32) * jnp.asarray(x_scale, jnp.float32)
    if v_int8:
        scale = scale * 4.0        # undo the in-kernel V>>2
    scale = jnp.pad(scale, ((0, 0), (0, 0), (0, kp - k)))
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)
    bias = jnp.pad(jnp.asarray(bias, jnp.float32), (0, kp - k)).reshape(1, 1, kp)
    if out_scale is None:
        out_scale = jnp.ones((), jnp.float32)
    out_scale = jnp.asarray(out_scale, jnp.float32).reshape(1)
    if v_int8:
        u8 = jnp.clip(u, -127, 127).astype(jnp.int8)
    else:
        u8 = u.astype(jnp.int16)

    grid = (n, h // bh, kp // bk)
    out_elem = jnp.int8 if requant else out_dtype
    kernel = functools.partial(
        _wino_kernel, bh=bh, w=w, c=c, wh=wh, v_int8=v_int8,
        relu=relu, requant=requant)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, c, bk), lambda n, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, bk), lambda n, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda n, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, bk), lambda n, i, j: (n, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, kp), out_elem),
        scratch_shapes=[
            pltpu.VMEM((1, 2, 2, bh // 2 + 1, wh, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 4 * c * kp,   # 16 MACs per 2x2-out tile pos
            bytes_accessed=n * h * w * c + 16 * c * kp
            + n * h * w * kp * (1 if requant else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p4, u8, scale, bias, out_scale)

    if kp != k:
        out = out[..., :k]
    return out
