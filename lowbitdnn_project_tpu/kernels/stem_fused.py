"""Fused ResNet stem kernel: 7x7/s2/p3 int8 conv + requant + 3x3/s2/p1
maxpool in ONE Pallas pass — the fusion XLA cannot express.

Why this exists: the C=3 stem is XLA's one demonstrably weak conv on v5e
(26% SOL, 573 us at batch 128; every XLA-level reformulation tried in
rounds 1-2 stayed >= 384 us), and the following maxpool is HBM-roofline
(169 us) *because it has to re-read the 103 MB stem output XLA wrote*.
Fusing conv+pool never materializes that intermediate: HBM traffic drops
from ~250 MB to 56 MB (30 in + 26 out). This is the reference's
specialized-kernel ethos (cpp/int8conv/check.cu:31-50 — a dedicated
kernel for the one shape the vendor library handles badly) applied to the
stem. Round-2 lesson applies: adoption is decided by e2e A/B only.

The formulation ("byte-plane GEMM"):
  * Pad C 3->4 and merge (W, C): padded row u becomes 1024 bytes; the 7x7
    window for stem col j covers merged bytes 8j+t, t in [0,27] with
    t = 4b + c (b = col tap, c = channel).
  * XLA prep splits each row into 8 BYTE PLANES of 128 lanes:
    planes[n, u, p, j] = row_u[8j + p]. Then tap t lives in plane p = t%8
    at lane offset s = t//8 in [0,3] — a pure LANE SHIFT.
  * Per pooled output row, one int8 MXU GEMM computes BOTH contributing
    stem rows: LHS = scattered weights (128, 288) [M = 2 stem rows x 64
    channels], RHS = X4 (288, 128) = [X9; X9<<1; X9<<2; X9<<3] where
    X9 = planes rows 4p'..4p'+8 (a free reshape of a contiguous slice)
    and << is an int8 lane roll (via int32 bitcast - Mosaic has no int8
    rotate). Lanes are stem cols. K padding (288 vs live 147x2/...) costs
    ~2x MACs - irrelevant next to the 10x layout win.
  * Epilogue (scale/bias/ReLU/requant, matching ops/conv.py:231-238
    bit-for-bit in op order) keeps everything in registers; a rolling
    1-row carry implements the 3-row maxpool; the 3-col window is two
    more lane rolls.
  * Stride-2 column selection + (k, j)->(j, k) transpose are TWO SMALL
    MATMULS (0/1 selection matrix, identity) - the MXU does the data
    movement the VPU cannot (no strided lane gathers on TPU).

Reference parity: replaces conv7x7+maxpool of the reference's ResNet stem
(python/qtorch/nn/modules: Int8Conv2d + MaxPool2d chain); the int8
algebra is exact, outputs match the XLA path within |delta| <= 1 requant
rounding (fma-order ulp differences at exact-half boundaries).

v1 MEASURED (b128, v5e): bit-exact vs the XLA chain but 4974 us vs 617 us
— the per-pool-row fori (56 iters/image x 128 grid steps) serializes tiny
(128,288)@(288,128) GEMMs behind VPU epilogues; MXU never pipelines.
Kept as lab history (the reference's v1..v6 ethos). v2 below fixes the
structure: R=14 row-pairs batched along lanes (N=1792 GEMM) and the
requant epilogue hoisted PAST the maxpool (monotonicity: alpha>0 affine +
round + clip all commute with max), so requant touches only pooled rows.

v3 (6-plane layout): drops the 4th zero-pad channel — merged byte 3w'+c,
taps t in [0,21), K 288 -> 216 (live rows padded to 4x56=224 for the
bitcast lane-roll). Two implementation lessons (both measured): the
in-kernel (9,6,128)->(54,128) reshape is a sublane relayout (6 breaks
tiling) that LOST 4-5% vs v2 despite the smaller K; emitting the planes
pre-flattened as (N,1392,128) makes every tap slice an 8-aligned flat-row
window (start 336j+24r, pl.multiple_of hint for the prover) and WINS:
standalone 1.156x/1.053x/1.060x over v2 at b8/32/64, e2e +1.6% at b8 and
parity at b32, bit-exact vs v2 on device (bench/probes/stem_v3_ab.py).
v3 is the routed default; stem_backend="fused2" pins v2. Row-pairs per
grid chunk (rp) is tunable; 4-way interleaved A/B (v{2,3} x rp{14,28},
all bit-exact): v3/rp28 50.3/216.4/414.8 us at b8/32/64 vs v3/rp14
51.7/219.4/414.1 — rp=28 is the v3 default (deltas <=3%, relay-noise
scale); v2 prefers rp=14.

v2 MEASURED (v5e, bit-exact vs the XLA chain at b8):
  standalone b128: 646 us (+45 us plane prep) vs XLA conv+pool 550 us.
  Stage breakdown (chained-timer ablation): main GEMM+patch build 444
  (MXU floor 172 of which ~130 is K=288 zero-tap padding; rolls 38,
  concat ~30, patch loads ~25, stores ~90, grid ~100), pool +120,
  requant +65, select/transpose +15.
  e2e ResNet-50 int8 chain (interleaved A/B, min of 3): WINS 2.05x at
  b8, 1.35x at b32, 1.13x at b64; parity at b96; loses 5% at b128 —
  in-chain XLA stem costs only ~350 us at b128 (fusion neighborhoods),
  so routing defaults to fused for batch <= 64 (models/resnet.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.quant.qtensor import QTensor


# ---------------------------------------------------------------- prep ---

def stem_plane_input(x_values: jax.Array) -> jax.Array:
    """int8 (N,224,224,3) -> byte planes (N, 232, 8, 128).

    planes[n, u, p, j] = merged byte 8j+p of padded row u, where padded
    row u = original row u-3 (conv pad 3) and merged byte 4w'+c of padded
    col w' = original col w'-3, channel c (c=3 zero pad).
    """
    n, h, w, c = x_values.shape
    assert (h, w, c) == (224, 224, 3), (h, w, c)
    xp = jnp.pad(x_values, ((0, 0), (3, 5), (3, 29), (0, 1)))  # (N,232,256,4)
    xm = xp.reshape(n, 232, 1024).reshape(n, 232, 128, 8)
    return xm.transpose(0, 1, 3, 2)                            # (N,232,8,128)


def stem_plane_filter(w: jax.Array) -> jax.Array:
    """(7,7,3,64) int8 -> the scattered GEMM LHS (128, 288) int8.

    W2[o*64+k, s*72 + u*8 + p]: o in {0,1} selects the stem row of the
    pair (local input row offset 2o), u in [0,9) the local padded row,
    (s,p) the byte tap t = 8s+p = 4b+c. Zero where the tap leaves the
    7x7x3 window.
    """
    kh, kw, c, k = w.shape
    assert (kh, kw, c, k) == (7, 7, 3, 64), w.shape
    idx = np.full((2, 64, 288), 49 * 21, np.int32)     # sentinel = zero row
    wflat_len = 7 * 7 * 3
    for o in range(2):
        for s in range(4):
            for u in range(9):
                for p in range(8):
                    t = 8 * s + p
                    if t > 26:
                        continue
                    b, ch = t // 4, t % 4
                    a = u - 2 * o
                    if ch >= 3 or not (0 <= a <= 6):
                        continue
                    col = s * 72 + u * 8 + p
                    idx[o, :, col] = a * 21 + b * 3 + ch
    wext = jnp.concatenate(
        [w.reshape(wflat_len, k), jnp.zeros((1, k), w.dtype)], axis=0)
    # gather: W2[o*64+k, col] = wext[idx[o, k, col], k]
    rows = []
    for o in range(2):
        g = wext[jnp.asarray(np.minimum(idx[o, 0], wflat_len))]   # (288, 64)
        rows.append(g.T)                                          # (64, 288)
    return jnp.concatenate(rows, axis=0)                          # (128, 288)


def stem_plane_input6(x_values: jax.Array) -> jax.Array:
    """v3 prep: int8 (N,224,224,3) -> byte planes (N, 232, 6, 128).

    Like stem_plane_input but WITHOUT the 4th zero-pad channel: merged
    byte of padded col w', channel c is 3w'+c, so stem col j's 7x3 window
    covers bytes 6j+t, t in [0,21) — plane p = t%6, lane shift s = t//6
    in [0,3]. K drops 288 -> 216 (25% fewer zero-tap MACs than v2's
    4-channel padding).
    """
    n, h, w, c = x_values.shape
    assert (h, w, c) == (224, 224, 3), (h, w, c)
    xp = jnp.pad(x_values, ((0, 0), (3, 5), (3, 29), (0, 0)))  # (N,232,256,3)
    xm = xp.reshape(n, 232, 768).reshape(n, 232, 128, 6)
    # emitted FLAT as (N, 232*6, 128) so the kernel's 54-row (9 padded
    # rows x 6 planes) slices start at (56j+4r)*6 = 336j+24r — 8-aligned,
    # no per-grid-step sublane relayout (the (9,6,128)->(54,128) in-kernel
    # reshape variant measured a 4-5%% LOSS vs v2 from exactly that)
    return xm.transpose(0, 1, 3, 2).reshape(n, 232 * 6, 128)


def stem_plane_filter6(w: jax.Array) -> jax.Array:
    """v3: (7,7,3,64) int8 -> the scattered GEMM LHS (128, 216) int8.

    W2[o*64+k, s*54 + u*6 + p]: tap t = 6s+p = 3b+c (b = col tap, c = the
    real channel — no pad channel in the 6-plane layout)."""
    kh, kw, c, k = w.shape
    assert (kh, kw, c, k) == (7, 7, 3, 64), w.shape
    # K blocks are 54 live rows padded to 56 (pltpu.bitcast needs the
    # sublane dim divisible by 4 for the int8 lane-roll)
    idx = np.full((2, 64, 224), 49 * 21, np.int32)     # sentinel = zero row
    wflat_len = 7 * 7 * 3
    for o in range(2):
        for s in range(4):
            for u in range(9):
                for p in range(6):
                    t = 6 * s + p
                    if t > 20:
                        continue
                    b, ch = t // 3, t % 3
                    a = u - 2 * o
                    if not (0 <= a <= 6):
                        continue
                    col = s * 56 + u * 6 + p
                    idx[o, :, col] = a * 21 + b * 3 + ch
    wext = jnp.concatenate(
        [w.reshape(wflat_len, k), jnp.zeros((1, k), w.dtype)], axis=0)
    rows = []
    for o in range(2):
        g = wext[jnp.asarray(np.minimum(idx[o, 0], wflat_len))]   # (224, 64)
        rows.append(g.T)                                          # (64, 224)
    return jnp.concatenate(rows, axis=0)                          # (128, 224)


def _pool_select() -> jax.Array:
    """(128, 64) int8 selection: S[c, j'] = 1 iff c == 2j', j' < 56."""
    s = np.zeros((128, 64), np.int8)
    for j in range(56):
        s[2 * j, j] = 1
    return jnp.asarray(s)


# -------------------------------------------------------------- kernel ---

def _roll8(v, s: int, right: bool = False):
    """Lane-roll an int8 (R,128) value by s in [1,3]; left: elem j <- j+s.

    Mosaic has no int8 lane rotate; bitcast to uint32 and move bytes.
    pltpu.bitcast packs along SUBLANES on TPU ((R,128)i8 -> (R/4,128)u32,
    bytes of 4 consecutive sublanes share a lane) in which case a u32
    lane-roll moves int8 lanes directly; lane-packed layouts
    ((R,32)u32) need byte shifts across the adjacent lane instead.
    """
    w = pltpu.bitcast(v, jnp.uint32)
    nlane = w.shape[1]
    if nlane == v.shape[1]:                        # sublane-packed: (R/4,L)
        out = pltpu.roll(w, shift=(nlane - s) if not right else s, axis=1)
        return pltpu.bitcast(out, jnp.int8)
    # lane-packed: (R, L/4); int8 lane 4l+b = byte b (LSB-first) of u32 lane l
    if not right:
        nxt = pltpu.roll(w, shift=nlane - 1, axis=1)   # u32 lane l <- l+1
        out = (w >> (8 * s)) | (nxt << (32 - 8 * s))
    else:
        prv = pltpu.roll(w, shift=1, axis=1)           # u32 lane l <- l-1
        out = (w << (8 * s)) | (prv >> (32 - 8 * s))
    return pltpu.bitcast(out, jnp.int8)


def _roll8_interp(v, s: int, right: bool = False):
    """Interpret-mode (CPU) lane roll with plain jnp; bit-identical wrap."""
    return jnp.roll(v, s if right else -s, axis=1)


def _stem_kernel(alpha_ref, beta_ref, invos_ref, planes_ref, w_ref,
                 sel_ref, ident_ref, out_ref, *, relu: bool,
                 interpret: bool):
    roll = _roll8_interp if interpret else _roll8
    alpha = alpha_ref[:]                     # (128, 1) f32
    beta = beta_ref[:]                       # (128, 1) f32
    inv_os = invos_ref[0, 0]                 # f32 scalar
    w2 = w_ref[:]                            # (128, 288) int8
    sel = sel_ref[:]                         # (128, 64) int8
    ident = ident_ref[:]                     # (64, 64) int8
    lane = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)

    def pool_row(p_, carry):
        # --- conv GEMM for stem rows (2p', 2p'+1) ---
        x9 = planes_ref[0, pl.ds(4 * p_, 9), :, :].reshape(72, 128)
        x4 = jnp.concatenate(
            [x9, roll(x9, 1), roll(x9, 2), roll(x9, 3)], axis=0)  # (288,128)
        acc = jax.lax.dot_general(
            w2, x4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                    # (128,128)
        # --- epilogue: same op order as ops/conv.py xla path ---
        f = acc.astype(jnp.float32) * alpha + beta
        if relu:
            f = jnp.maximum(f, 0.0)
        q = jnp.clip(jnp.round(f * inv_os), -127.0, 127.0).astype(jnp.int8)
        # --- 3x3/s2 maxpool in int32 (Mosaic cannot legalize int8 maxsi;
        # int32 also gets the native 32-bit lane rotate) ---
        q0 = q[0:64, :].astype(jnp.int32)
        q1 = q[64:128, :].astype(jnp.int32)
        rowmax = jnp.maximum(jnp.maximum(carry, q0), q1)
        if interpret:
            mr = jnp.roll(rowmax, -1, axis=1)         # elem c <- c+1
            ml = jnp.roll(rowmax, 1, axis=1)          # elem c <- c-1
        else:
            mr = pltpu.roll(rowmax, shift=127, axis=1)
            ml = pltpu.roll(rowmax, shift=1, axis=1)
        ml = jnp.where(lane == 0, jnp.int32(-128), ml)  # col -1 pad
        m3 = jnp.maximum(jnp.maximum(ml, rowmax), mr)
        # --- stride-2 col select + transpose, both on the MXU ---
        pooled_kt = jax.lax.dot_general(
            m3.astype(jnp.int8), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)   # (64,64) kxj'
        out_t = jax.lax.dot_general(
            pooled_kt, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)   # (64,64) j'xk
        out_ref[0, p_, :, :] = out_t[0:56, :]
        return q1                                     # next carry: row 2p'+1

    carry0 = jnp.full((64, 128), -128, jnp.int32)
    jax.lax.fori_loop(0, 56, pool_row, carry0)


# ----------------------------------------------------------- v2 kernel ---
#
# Structure fix over v1 (which measured 4974 us vs XLA 617 at b128): batch
# R=14 row-pairs along the GEMM lane dim (one (128,288)x(288,1792) MXU op
# per chunk instead of 14 serialized (288,128) ones) and hoist the requant
# epilogue PAST the maxpool — alpha>0 affine, round and clip are all
# monotone non-decreasing, and pooling is spatial within a channel, so
# requant(maxpool(acc)) == maxpool(requant(acc)) bit-for-bit while running
# the float epilogue on 4x fewer rows. The inter-pair pool carry rides a
# VMEM scratch across grid steps (grid = (image, chunk), chunk fastest).

_R = 14            # default row-pairs per chunk (56 pool rows = 4 chunks);
#                    overridable per call — measured A/B in
#                    bench/probes/stem_v3_ab.py picks the routed default
_NEG = -(2 ** 30)  # pool pad; any real int32 acc (|.| <= 288*127^2) wins


def _pool_select_t() -> jax.Array:
    """(64, 128) int8 selection: S[j', c] = 1 iff c == 2j', j' < 56."""
    s = np.zeros((64, 128), np.int8)
    for j in range(56):
        s[j, 2 * j] = 1
    return jnp.asarray(s)


def _stem_kernel_v2(alpha_ref, beta_ref, invos_ref, planes_ref, w_ref,
                    selt_ref, out_ref, carry_ref, *, relu: bool,
                    interpret: bool, rp: int = _R):
    roll8 = _roll8_interp if interpret else _roll8
    j = pl.program_id(1)
    alpha = alpha_ref[:]                     # (64, 1) f32
    beta = beta_ref[:]                       # (64, 1) f32
    inv_os = invos_ref[0, 0]                 # f32 scalar
    w2 = w_ref[:]                            # (128, 9*planes) int8
    sel_t = selt_ref[:]                      # (64, 128) int8
    wide = 128 * rp
    flat6 = len(planes_ref.shape) == 3       # v3: (1, 232*6, 128) flat
    planes = 6 if flat6 else planes_ref.shape[2]
    kp = 9 * planes                          # live K rows per shift: 72 / 54
    kq = -(-kp // 4) * 4                     # padded to 4 (bitcast): 72 / 56

    @pl.when(j == 0)
    def _init():
        carry_ref[:] = jnp.full((64, 128), _NEG, jnp.int32)

    # --- gather the R row-pair plane slices side by side along lanes ---
    def body(x_ref):
        for r in range(rp):
            if flat6:
                # load the 8-aligned kq-row window; rows [kp, kq) belong
                # to the next group and are masked to zero
                start = pl.multiple_of((4 * rp * j + 4 * r) * 6, 24)
                blk = planes_ref[0, pl.ds(start, kq), :]
                rid = jax.lax.broadcasted_iota(jnp.int32, (kq, 128), 0)
                blk = jnp.where(rid < kp, blk, jnp.int8(0))
            else:
                x9 = planes_ref[0, pl.ds(4 * rp * j + 4 * r, 9), :, :]
                blk = x9.reshape(kp, 128)
                if kq != kp:
                    blk = jnp.concatenate(
                        [blk, jnp.zeros((kq - kp, 128), jnp.int8)], axis=0)
            x_ref[:, 128 * r:128 * (r + 1)] = blk
        x = x_ref[:]                                         # (72, wide)
        # live lanes per 128-block are [0,112); rolls only pollute dead ones
        x4 = jnp.concatenate(
            [x, roll8(x, 1), roll8(x, 2), roll8(x, 3)], axis=0)
        acc = jax.lax.dot_general(
            w2, x4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                # (128, wide)
        acc0, acc1 = acc[0:64, :], acc[64:128, :]
        # --- 3-row max in the int32 acc domain; carry = prior pair row 1 ---
        prev1 = jnp.concatenate(
            [carry_ref[:], acc1[:, :wide - 128]], axis=1)
        carry_ref[:] = acc1[:, wide - 128:]
        rowmax = jnp.maximum(jnp.maximum(prev1, acc0), acc1)
        if interpret:
            mr = jnp.roll(rowmax, -1, axis=1)
            ml = jnp.roll(rowmax, 1, axis=1)
        else:
            mr = pltpu.roll(rowmax, shift=wide - 1, axis=1)
            ml = pltpu.roll(rowmax, shift=1, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (64, wide), 1)
        ml = jnp.where(lane % 128 == 0, jnp.int32(_NEG), ml)  # col -1 pad
        m3 = jnp.maximum(jnp.maximum(ml, rowmax), mr)
        # --- requant AFTER the pool (monotone-commute), 4x fewer rows ---
        f = m3.astype(jnp.float32) * alpha + beta
        if relu:
            f = jnp.maximum(f, 0.0)
        q = jnp.clip(jnp.round(f * inv_os), -127.0, 127.0).astype(jnp.int8)
        # --- per pair: stride-2 select + transpose in ONE NT matmul ---
        for r in range(rp):
            out_t = jax.lax.dot_general(
                sel_t, q[:, 128 * r:128 * (r + 1)],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.int8)  # (64,64)
            out_ref[0, pl.ds(rp * j + r, 1), :, :] = (
                out_t[0:56, :].reshape(1, 56, 64))

    pl.run_scoped(body, pltpu.VMEM((kq, wide), jnp.int8))


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "rp"))
def _stem_fused_call_v2(planes, w2, alpha, beta, inv_os, sel_t,
                        relu: bool, interpret: bool, rp: int = _R):
    n = planes.shape[0]
    nplanes = 6 if planes.ndim == 3 else planes.shape[2]
    kq = -(-9 * nplanes // 4) * 4            # 72 (v2, 8 planes) / 56 (v3, 6)
    planes_spec = (
        pl.BlockSpec((1, 232 * 6, 128), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM) if planes.ndim == 3 else
        pl.BlockSpec((1, 232, nplanes, 128), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM))
    kernel = functools.partial(_stem_kernel_v2, relu=relu,
                               interpret=interpret, rp=rp)
    flops = n * 56 * 2 * (128 * 4 * kq * 128 + 64 * 128 * 64)
    return pl.pallas_call(
        kernel,
        grid=(n, 56 // rp),
        in_specs=[
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            planes_spec,
            pl.BlockSpec((128, 4 * kq), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 56, 56, 64), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 56, 56, 64), jnp.int8),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=planes.size + n * 56 * 56 * 64,
            transcendentals=0),
    )(alpha, beta, inv_os, planes, w2, sel_t)


# ----------------------------------------------------------- host side ---

@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def _stem_fused_call(planes, w2, alpha, beta, inv_os, sel, ident,
                     relu: bool, interpret: bool):
    n = planes.shape[0]
    kernel = functools.partial(_stem_kernel, relu=relu, interpret=interpret)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 232, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 288), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 56, 56, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = n * 56 * 2 * (128 * 288 * 128 + 128 * 64 * 64 + 64 * 64 * 64)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 56, 56, 64), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=planes.size + n * 56 * 56 * 64,
            transcendentals=0),
    )(alpha, beta, inv_os, planes, w2, sel, ident)


def stem_conv_pool_fused(
    x_q: QTensor,                 # (N,224,224,3) int8, per-tensor scale
    w_q: QTensor,                 # (7,7,3,64) int8, per-channel axis=3
    bias: Optional[jax.Array],    # (64,) f32 or None
    out_scale,                    # scalar
    *,
    relu: bool = True,
    interpret: bool = False,
    version: int = 2,
    row_pairs: Optional[int] = None,
) -> QTensor:
    """Fused stem: 7x7/s2/p3 conv + bias/ReLU/requant + 3x3/s2/p1 maxpool.

    int8 (N,224,224,3) -> int8 QTensor (N,56,56,64); equals
    qconv2d(stride=2, padding=3, relu, out_scale) + qmax_pool2d(3,2,1)
    within |delta| <= 1 (requant rounding at exact-half fma boundaries).
    ``version`` selects the kernel generation (1 = serial per-row lab
    history, 2 = wide-N + pool-before-requant; see module docstring).
    """
    if version == 3:
        planes = stem_plane_input6(x_q.values)
        w2 = stem_plane_filter6(w_q.values)
    else:
        planes = stem_plane_input(x_q.values)
        w2 = stem_plane_filter(w_q.values)
    k = w_q.shape[3]
    scale = (x_q.scale * w_q.scale_vector()).astype(jnp.float32)
    inv_os = (1.0 / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)
    bias_v = (jnp.zeros((k,), jnp.float32) if bias is None
              else jnp.asarray(bias, jnp.float32))
    if version in (2, 3):
        alpha = jnp.broadcast_to(scale.reshape(-1), (k,))
        # measured per-version best (bench/probes/stem_v3_ab.py, 4-way
        # interleaved): v3 prefers rp=28 (wins b8/b32, ties b64), v2 rp=14
        rp = row_pairs if row_pairs is not None else (28 if version == 3 else _R)
        assert 56 % rp == 0, rp
        out = _stem_fused_call_v2(
            planes, w2, alpha.reshape(k, 1), bias_v.reshape(k, 1),
            inv_os, _pool_select_t(), relu, interpret, rp)
    else:
        alpha = jnp.tile(jnp.broadcast_to(scale.reshape(-1), (k,)), 2)
        beta = jnp.tile(bias_v, 2)
        out = _stem_fused_call(
            planes, w2, alpha.reshape(2 * k, 1), beta.reshape(2 * k, 1),
            inv_os, _pool_select(), jnp.eye(64, dtype=jnp.int8),
            relu, interpret)
    return QTensor(values=out, scale=jnp.asarray(out_scale, jnp.float32),
                   bits=8, axis=None)
