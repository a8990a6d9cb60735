"""Pallas int8 GEMM with a fused requantize+bias+ReLU epilogue — the flagship
MXU kernel.

TPU-native replacement for the reference's CUDA int8 conv kernels
(cpp/int8conv/conv2DForward3x3TensorCores.cuh WMMA path,
cpp/int8conv/conv2DForward3x3.cuh dp4a path) and the cuDNN alpha-folding
dequant trick (python/qtorch/cpp/conv2d.cuh:147-155, alpha = in_scale*w_scale):
all convs and linears in the engine funnel into this int8 x int8 -> int32
matmul whose epilogue applies per-output-channel combined scales, bias, ReLU,
and (optionally) requantization back to int8 — exactly the fusion the
reference performs with cuDNN's alpha plus the fused epilogue of
conv2DForward3x3Fused.cuh:216.

Design notes (TPU):
  * int8 operands feed the 128x128 MXU at int8 throughput with int32
    accumulation (preferred_element_type=int32).
  * Grid (M/bm, N/bn, K/bk) with K innermost ("arbitrary") so the int32
    accumulator tile lives in a VMEM scratch across the K loop; the epilogue
    runs once on the final K step — accumulator never round-trips to HBM.
  * Per-channel scale and bias ride in as (1, N) vectors blocked to (1, bn).
  * Requantized output writes int8 tiles (min tile 32x128); float output
    writes f32/bf16 tiles.
  * Shapes are zero-padded to tile multiples by the wrapper — exact for
    integer matmul — and the result is sliced back.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _matmul_kernel(a_ref, b_ref, scale_ref, bias_ref, out_scale_ref, out_ref,
                   acc_ref, *, nk: int, relu: bool, requant: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32) * scale_ref[:]
        out = out + bias_ref[:]
        if relu:
            out = jnp.maximum(out, 0.0)
        if requant:
            inv = 1.0 / out_scale_ref[0]
            q = jnp.round(out * inv)
            out_ref[:] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
        else:
            out_ref[:] = out.astype(out_ref.dtype)


def _pick_block(dim: int, pref: int, align: int) -> int:
    """Block size: the preferred tile, shrunk (aligned) for small dims."""
    if dim >= pref:
        return pref
    return _round_up(dim, align)


def choose_blocks(M: int, K: int, N: int, requant: bool,
                  vmem_budget: int = 11 * 2 ** 20):
    """Grid-step count dominates Pallas matmul cost on this chip
    (~0.2us/step measured): maximize block sizes within VMEM.

    bk: whole K when it fits (<=2048), else the largest 128-multiple divisor;
    bn: up to 512; bm: grown until the working set (double-buffered A/out +
    resident B + int32 accumulator) hits the budget.
    """
    if K <= 2048:
        bk = K
    else:
        cand = [d for d in range(2048, 0, -128) if K % d == 0]
        bk = cand[0] if cand else K
    bn = min(N, 512)
    if N % bn:
        bn = N if N <= 1024 else (256 if N % 256 == 0 else 128)

    out_bytes = 1 if requant else 4
    bm = 256
    while bm < 8192 and bm < M:
        nxt = bm * 2
        use = (2 * nxt * bk          # A blocks, double-buffered
               + 2 * bk * bn         # B blocks
               + 4 * nxt * bn        # int32 accumulator scratch
               + 2 * nxt * bn * out_bytes)
        if use > vmem_budget:
            break
        bm = nxt
    bm = min(bm, _round_up(M, 32 if requant else 8))
    return bm, bn, bk


@functools.partial(
    jax.jit,
    static_argnames=("relu", "requant", "out_dtype", "bm", "bn", "bk",
                     "interpret"),
)
def int8_matmul_fused(
    a: jax.Array,                       # (M, K) int8
    b: jax.Array,                       # (K, N) int8
    scale: jax.Array,                   # (N,) or () f32 — combined a*b scale
    bias: Optional[jax.Array] = None,   # (N,) f32
    out_scale: Optional[jax.Array] = None,  # () f32 — requantize if set
    *,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """C = epilogue(A @ B) with int8 inputs and int32 accumulation.

    epilogue(acc) = [requantize_{out_scale}] ( [relu] ( acc * scale + bias ) )

    Returns int8 (requant=True) or ``out_dtype`` float array of shape (M, N).
    Block sizes default to choose_blocks (big blocks, few grid steps); no
    host-side padding — Pallas/Mosaic pads sub-128 and ragged tiles free.
    """
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)

    abm, abn, abk = choose_blocks(M, K, N, requant)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    bm = min(bm, _round_up(M, 32 if requant else 8))
    if N % bn:
        bn = N if N <= 1024 else 128
    bk = min(bk, K)
    if K % bk:
        cand = [d for d in range(bk - bk % 128, 0, -128) if K % d == 0]
        bk = cand[0] if cand else K

    scale = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(-1), (N,)).reshape(1, N)
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, N)
    if out_scale is None:
        out_scale = jnp.ones((), jnp.float32)
    out_scale = jnp.asarray(out_scale, jnp.float32).reshape(1)

    nk = K // bk
    grid = (_cdiv(M, bm), _cdiv(N, bn), nk)

    kernel = functools.partial(
        _matmul_kernel, nk=nk, relu=relu, requant=requant)

    out_elem = jnp.int8 if requant else out_dtype
    flops = 2 * M * N * K
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_elem),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * K + K * N + M * N * (1 if requant else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, scale, bias, out_scale)
    return out


def int8_matmul_xla(
    a: jax.Array,
    b: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Bit-identical XLA reference path (oracle + non-TPU fallback)."""
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * jnp.asarray(scale, jnp.float32).reshape(1, -1)
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32).reshape(1, -1)
    if relu:
        out = jnp.maximum(out, 0.0)
    if requant:
        q = jnp.round(out / jnp.asarray(out_scale, jnp.float32))
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    return out.astype(out_dtype)
