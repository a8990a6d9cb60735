"""Fused layer1 bottleneck kernel — kernel-lab generation v5.

Why layer1: the in-chain stage bisection (BENCH_NOTES round 2) puts
layer1 at 412 us of the 1397 us b32 flagship forward (29%, the largest
stage) running at ~26% of nominal int8 peak. The cause is structural:
cmid=64 starves the MXU lane dims of every conv in the stage, and
block_flat.py (generation v4) excluded cmid<128 entirely. XLA runs
layers 2-4 chains at up to 93% effective — but NOT layer1.

What this kernel does (one Pallas call per bottleneck block):

  h1  = requant(relu(x @ W1 * a1 + b1))            1x1, A -> 64
  h2  = requant(relu(conv3x3(h1) * a2 + b2))       3x3, 64 -> 64
  hb  = bf16(acc3 * a3 + b3)                       1x1, 64 -> 256
  id  = bf16(x * s_in)            (or the ds conv epilogue, 1x1 A -> 256)
  out = int8(round(max(hb + id, 0) / s_out))

with h1/h2/acc3 never leaving VMEM and the float-domain residual tail
(models/resnet.py apply_quantized_int8chain, add_domain="float") fused
into the same pass — bit-identical f32/bf16 op order to the classic
three-qconv2d chain.

Layout: grid (N, 2); the full (56,56,A) image is DMA'd into a VMEM slab
once per image (chunk j==0), conv1 runs once per image into a margin-
padded flat (3264, 64) h1 buffer, and each chunk emits 28 output rows.
conv2 is ONE (1568, 640) x (640, 64) MXU GEMM per chunk: the 9 taps are
static misaligned row-slices of the flat h1 buffer (the conv_flat.py v3
insight — tap (dy,dx) of flat output row u is flat input row
u + 56*dy + dx) concatenated along lanes with w-edge masks, K padded
576 -> 640. No im2col relayouts, no patch DMA.

Reference parity: the persistent-tiling across a whole residual block is
the reference's custom2DConvolution.cuh v5/v6 in-block accumulation idea;
the chain semantics follow python/df-optimization/Int8Conv2d.py.

MEASURED (TPU v5e, b32, interleaved min — bench/probes/block_l1_probe.py and
bench/probes/block_l1_ablate.py; see BENCH_NOTES round 2 "fused layer1"):
bit-exact vs the classic chain (maxdiff 0 on device), but **loses 2.8x**:
fused 450 us vs classic XLA block 161 us standalone (137 us in-chain).
The ablation pins it on conv2: ANY in-kernel c2 formulation costs
170-270 us against XLA's 64 us for the same op —
  * patch-GEMM (K=640): the patch build writes 10x h1's bytes through
    the VPU (2 MB/img written+read vs the 196 KB h1);
  * 9 accumulated K=64 GEMMs: no patch, but the MXU runs at 25%
    (K=64 AND N=64 both half-empty);
  * even with (invalid) 8-aligned tap offsets — isolating away the
    sublane-rotation cost (~93 us) — c2 still costs 174 us.
Meanwhile the kernel WITHOUT c2 (c1+c3+tail, 156 us) already costs as
much as XLA's whole block. Conclusion (generation v4's block_flat lesson,
now measured for the lane-starved stage too): XLA's conv emitter's
internal im2col machinery is better than anything expressible through
Pallas VPU ops for small-C 3x3 convs, and the VMEM-residency savings
(~30 us of HBM round-trips per block) cannot pay for it. Layer1's 26%
of nominal peak is the lane-starvation ceiling (50%) times XLA's real
in-chain efficiency — there is no kernel win hiding in it. Kept as lab
history with tests; not routed.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.quant.qtensor import QTensor

_H = 56            # spatial size of layer1
_M = _H * _H       # 3136 flat pixels per image
_MC = _M // 2      # 1568 pixels per chunk (28 output rows)
_MARG = 64         # zero margin rows around the flat h1 buffer
_KPAD = 640        # conv2 GEMM K: 9 taps * 64 + one zero block


def _requant(acc, a, b, inv, relu=True):
    """The ops/conv.py int8-out epilogue, same op order bit-for-bit."""
    f = acc.astype(jnp.float32) * a + b
    if relu:
        f = jnp.maximum(f, 0.0)
    return jnp.clip(jnp.round(f * inv), -127.0, 127.0).astype(jnp.int8)


def _kernel(scal_ref, a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
            ad_ref, bd_ref, w1_ref, w2p_ref, w3_ref, wd_ref, x_hbm,
            out_ref, slab, h1x, patch, sem, *, a_pad: int, has_ds: bool,
            out_c: int, cmid: int):
    n = pl.program_id(0)
    j = pl.program_id(1)
    kp = w2p_ref.shape[0]

    @pl.when(j == 0)
    def _per_image():
        dma = pltpu.make_async_copy(x_hbm.at[n], slab, sem)
        dma.start()
        dma.wait()
        xf = slab[:].reshape(_M, a_pad)
        acc1 = jnp.dot(xf, w1_ref[:], preferred_element_type=jnp.int32)
        h1 = _requant(acc1, a1_ref[:], b1_ref[:], scal_ref[0, 0])
        h1x[0:_MARG, :] = jnp.zeros((_MARG, cmid), jnp.int8)
        h1x[_MARG:_MARG + _M, :] = h1
        h1x[_MARG + _M:_MARG + _M + _MARG, :] = \
            jnp.zeros((_MARG, cmid), jnp.int8)

    def chunk(base: int):
        # --- conv2: 9 static tap slices of flat h1 -> one K=640 GEMM;
        # pieces land in the patch scratch (lane-offset stores — Mosaic
        # cannot concatenate mixed sublane-offset 64-lane vectors) ---
        widx = jax.lax.broadcasted_iota(jnp.int32, (_MC, cmid), 0) % _H
        for dy in range(3):
            for dx in range(3):
                st = _MARG + base + (dy - 1) * _H + (dx - 1)
                p = h1x[st:st + _MC, :]
                if dx == 0:      # flat row u-1 wraps to (h-1, w=55): mask
                    p = jnp.where(widx == 0, jnp.int8(0), p)
                elif dx == 2:    # flat row u+1 wraps to (h+1, w=0): mask
                    p = jnp.where(widx == _H - 1, jnp.int8(0), p)
                t = 3 * dy + dx
                patch[:, t * cmid:(t + 1) * cmid] = p
        patch[:, 9 * cmid:kp] = jnp.zeros((_MC, kp - 9 * cmid), jnp.int8)
        acc2 = jnp.dot(patch[:], w2p_ref[:],
                       preferred_element_type=jnp.int32)
        h2 = _requant(acc2, a2_ref[:], b2_ref[:], scal_ref[0, 1])
        # --- conv3 + float-domain residual tail (chain bit-order) ---
        acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
        hb = (acc3.astype(jnp.float32) * a3_ref[:]
              + b3_ref[:]).astype(jnp.bfloat16)
        id8 = slab[:].reshape(_M, a_pad)[base:base + _MC, :]
        if has_ds:
            accd = jnp.dot(id8, wd_ref[:], preferred_element_type=jnp.int32)
            idb = (accd.astype(jnp.float32) * ad_ref[:]
                   + bd_ref[:]).astype(jnp.bfloat16)
        else:
            idb = (id8[:, 0:out_c].astype(jnp.float32)
                   * scal_ref[0, 2]).astype(jnp.bfloat16)
        s = jnp.maximum(hb + idb, jnp.bfloat16(0))
        q = jnp.clip(jnp.round(s.astype(jnp.float32) / scal_ref[0, 3]),
                     -127.0, 127.0).astype(jnp.int8)
        out_ref[0] = q.reshape(_H // 2, _H, out_c)

    @pl.when(j == 0)
    def _c0():
        chunk(0)

    @pl.when(j == 1)
    def _c1():
        chunk(_MC)


@functools.partial(jax.jit, static_argnames=("has_ds", "interpret"))
def _block_l1_call(x, scal, a1, b1, a2, b2, a3, b3, ad, bd,
                   w1, w2p, w3, wd, has_ds: bool, interpret: bool):
    n, h, _, a_pad = x.shape
    cmid = w1.shape[1]
    out_c = w3.shape[1]
    kernel = functools.partial(_kernel, a_pad=a_pad, has_ds=has_ds,
                               out_c=out_c, cmid=cmid)
    vec = lambda r, c: pl.BlockSpec((r, c), lambda i, j: (0, 0),
                                    memory_space=pltpu.VMEM)
    flops = 2 * n * _M * (a_pad * cmid + _KPAD * cmid + cmid * out_c
                          + (a_pad * out_c if has_ds else 0))
    return pl.pallas_call(
        kernel,
        grid=(n, 2),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            vec(1, cmid), vec(1, cmid), vec(1, cmid), vec(1, cmid),
            vec(1, out_c), vec(1, out_c), vec(1, out_c), vec(1, out_c),
            vec(a_pad, cmid), vec(_KPAD, cmid), vec(cmid, out_c),
            vec(a_pad, out_c),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, h // 2, h, out_c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, h, out_c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h, h, a_pad), jnp.int8),
            pltpu.VMEM((_M + 2 * _MARG, cmid), jnp.int8),
            pltpu.VMEM((_MC, _KPAD), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size + n * _M * out_c,
            transcendentals=0),
    )(scal, a1, b1, a2, b2, a3, b3, ad, bd, w1, w2p, w3, wd, x)


def _avec(s_prev, w_q, bias, k):
    a = jnp.broadcast_to(
        (jnp.asarray(s_prev, jnp.float32)
         * w_q.scale_vector()).astype(jnp.float32).reshape(-1), (k,))
    b = (jnp.zeros((k,), jnp.float32) if bias is None
         else jnp.asarray(bias, jnp.float32))
    return a.reshape(1, k), b.reshape(1, k)


def bottleneck_l1_fused(
    x_q: QTensor,            # (N, 56, 56, A) int8, per-tensor scale
    p1, p2, p3,              # QConvParams: 1x1 A->64, 3x3 64->64, 1x1 64->256
    s2, s3, s_out,           # requant scales after c1 / c2 / the block
    ds=None,                 # QConvParams 1x1 A->256 (block 0) or None
    *,
    interpret: bool = False,
) -> QTensor:
    """Whole float-add bottleneck block in one Pallas pass.

    Bit-identical to the classic chain block: qconv2d(c1, relu, s2) ->
    qconv2d(c2, pad 1, relu, s3) -> qconv2d(c3, float bf16 out) + bf16
    identity (dequant or ds conv) -> relu -> quantize(s_out). A=64 inputs
    are lane-padded to 128 for the DMA/tiling alignment (zero weight rows
    keep the integer algebra exact).
    """
    n, h, w, a = x_q.shape
    cmid = p2.weight.shape[2]
    out_c = p3.weight.shape[3]
    if (h, w) != (_H, _H) or w % 2:
        raise ValueError(f"bottleneck_l1_fused: needs 56x56 input, got "
                         f"{x_q.shape}")
    if cmid != 64 or p2.weight.shape[:2] != (3, 3):
        raise ValueError(f"bottleneck_l1_fused: needs a 3x3 cmid=64 conv2, "
                         f"got {p2.weight.shape}")

    xv = x_q.values
    w1 = p1.weight.values.reshape(a, cmid)
    wd = (ds.weight.values.reshape(a, out_c) if ds is not None
          else jnp.zeros((a, out_c), jnp.int8))
    a_pad = max(a, 128)
    if a < a_pad:
        xv = jnp.pad(xv, ((0, 0), (0, 0), (0, 0), (0, a_pad - a)))
        w1 = jnp.pad(w1, ((0, a_pad - a), (0, 0)))
        wd = jnp.pad(wd, ((0, a_pad - a), (0, 0)))
    w2p = jnp.concatenate(
        [p2.weight.values.reshape(9 * cmid, cmid),
         jnp.zeros((_KPAD - 9 * cmid, cmid), jnp.int8)], axis=0)
    w3 = p3.weight.values.reshape(cmid, out_c)

    s2 = jnp.asarray(s2, jnp.float32)
    s3 = jnp.asarray(s3, jnp.float32)
    s_out = jnp.asarray(s_out, jnp.float32)
    a1, b1 = _avec(x_q.scale, p1.weight, p1.bias, cmid)
    a2, b2 = _avec(s2, p2.weight, p2.bias, cmid)
    a3, b3 = _avec(s3, p3.weight, p3.bias, out_c)
    if ds is not None:
        ad, bd = _avec(x_q.scale, ds.weight, ds.bias, out_c)
    else:
        ad = jnp.zeros((1, out_c), jnp.float32)
        bd = jnp.zeros((1, out_c), jnp.float32)
    scal = jnp.stack([1.0 / s2, 1.0 / s3,
                      jnp.asarray(x_q.scale, jnp.float32).reshape(()),
                      s_out]).reshape(1, 4)

    out = _block_l1_call(xv, scal, a1, b1, a2, b2, a3, b3, ad, bd,
                         w1, w2p, w3, wd, ds is not None, interpret)
    return QTensor(values=out, scale=s_out, bits=8, axis=None)
