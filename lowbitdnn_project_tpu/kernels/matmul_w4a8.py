"""W4A8 Pallas GEMM: int4-packed weights unpacked in-kernel, int8 activations.

BASELINE.json config 5 (INT4 weight-only + INT8 activations). No reference
counterpart kernel (the reference is int8-only); the point on TPU: weights
stream from HBM nibble-packed (half the bytes — the win for weight-bound
GEMMs/1x1 convs at small batch), are sign-extended to int8 on the VPU inside
VMEM, and feed the MXU at full int8 throughput. XLA cannot express this —
it would materialize the unpacked weights in HBM.

Packing: along K (the contraction dim), row pairs (2k, 2k+1) -> one uint8
row (lo nibble = even row, hi = odd), so the kernel unpack is a cheap
(bk/2, bn) -> (bk, bn) sublane interleave.
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


def default_block_k(K: int) -> int:
    """The K-block both pack_int4_rows and w4a8_matmul_fused agree on.

    Small (256) on purpose: the unpack holds ~3 int32 temps of the B block
    in VMEM, and a small bk lets bn grow instead — measured best on v5e
    (bn=4096/bk=256 beat bn=512/bk=512 by 1.8x on weight-bound shapes).
    """
    if K % 256 == 0:
        return 256
    cand = [d for d in range(min(K, 512), 0, -2) if K % d == 0]
    return cand[0] if cand else K


def _choose_w4a8_blocks(M: int, K: int, N: int, requant: bool,
                        vmem_budget: int = 11 * 2 ** 20):
    """Maximize bn (fewest grid steps) within VMEM, then grow bm."""
    bk = default_block_k(K)
    bm = min(-(-M // 32) * 32, 1024)
    out_b = 1 if requant else 4

    def use(bm_, bn_):
        return (2 * bm_ * bk                # A blocks
                + 2 * (bk // 2) * bn_       # packed B blocks
                + 3 * (bk // 2) * bn_ * 4   # unpack int32 temps
                + 4 * bm_ * bn_             # accumulator
                + 2 * bm_ * bn_ * out_b)    # out blocks

    bn = min(N, 128)
    while bn < N and bn < 8192 and use(bm, min(bn * 2, N)) <= vmem_budget:
        bn = min(bn * 2, N)
    if N % bn:
        bn = N if N <= 1024 else 128
    return bm, bn, bk


def pack_int4_rows(w: jax.Array, block_k: Optional[int] = None) -> jax.Array:
    """(K, N) int4-valued int8 -> (K//2, N) uint8.

    Within each ``block_k`` row-block, row j packs the pair
    (j, j + block_k/2): lo nibble = first half of the block, hi = second.
    The kernel then unpacks a block with a plain concat of halves — no
    sublane interleave (interleaving costs a relayout per grid step).
    block_k defaults to default_block_k(K), matching the kernel's default.
    """
    k, n = w.shape
    bk = block_k or default_block_k(k)
    if k % bk or bk % 2:
        raise ValueError(f"K={k} must tile by even block_k={bk}")
    u = (w.astype(jnp.int32) & 0xF).astype(jnp.uint8)
    blocks = u.reshape(k // bk, bk, n)
    lo = blocks[:, : bk // 2]
    hi = blocks[:, bk // 2:]
    return ((hi << 4) | lo).reshape(k // 2, n)


def _unpack_rows(packed_u8: jax.Array) -> jax.Array:
    """(bk/2, bn) uint8 -> (bk, bn) int8, halves-concat layout.

    All bit ops run in int32: Mosaic cannot legalize uint8 shifts
    (arith.shrui) on the VPU, but int32 shift/and lower fine.
    """
    v = packed_u8.astype(jnp.int32)
    lo = v & 0xF
    hi = (v >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def _w4a8_kernel(a_ref, bp_ref, scale_ref, bias_ref, out_scale_ref, out_ref,
                 acc_ref, *, nk: int, relu: bool, requant: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = _unpack_rows(bp_ref[:])
    acc_ref[:] += jnp.dot(a_ref[:], b, preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32) * scale_ref[:]
        out = out + bias_ref[:]
        if relu:
            out = jnp.maximum(out, 0.0)
        if requant:
            inv = 1.0 / out_scale_ref[0]
            out_ref[:] = jnp.clip(jnp.round(out * inv), -127.0, 127.0
                                  ).astype(jnp.int8)
        else:
            out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "requant", "out_dtype", "bm", "bn", "bk",
                     "interpret"),
)
def w4a8_matmul_fused(
    a: jax.Array,                 # (M, K) int8 activations
    b_packed: jax.Array,          # (K//2, N) uint8 nibble-packed int4 weights
    scale: jax.Array,             # (N,) f32 combined act*w scale
    bias: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    requant: bool = False,
    out_dtype=jnp.float32,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    M, K = a.shape
    Kh, N = b_packed.shape
    assert Kh * 2 == K, (a.shape, b_packed.shape)

    abm, abn, abk = _choose_w4a8_blocks(M, K, N, requant)
    bm, bn = bm or abm, bn or abn
    bm = min(bm, -(-M // 32) * 32)
    if N % bn:
        bn = N if N <= 1024 else 128
    # bk must equal the block_k used by pack_int4_rows (halves-concat
    # pairing is per block)
    bk = bk or abk
    assert K % bk == 0 and bk % 2 == 0, (K, bk)

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
    kernel = functools.partial(_w4a8_kernel, nk=nk, relu=relu, requant=requant)
    out_elem = jnp.int8 if requant else out_dtype

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
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
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + M * N * (1 if requant else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b_packed, scale, bias, out_scale)


def w4a8_matmul_xla(a, b_int4, scale, bias=None, out_scale=None, *,
                    relu=False, requant=False, out_dtype=jnp.float32):
    """Oracle: unpacked int4 weights through the plain XLA int8 path."""
    from lowbitdnn_project_tpu.kernels.matmul_int8 import int8_matmul_xla

    return int8_matmul_xla(a, b_int4, scale, bias, out_scale, relu=relu,
                           requant=requant, out_dtype=out_dtype)
