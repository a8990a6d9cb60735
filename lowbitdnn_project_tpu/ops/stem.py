"""Space-to-depth stem: the 7x7/s2 C=3 conv + 3x3/s2 maxpool, TPU-fast.

The ResNet stem is XLA's one demonstrably weak conv on v5e: C=3 leaves the
MXU contraction dim ~empty (8.4% SOL, 446-520 us at batch 32; every direct
reformulation — NCHW, bf16, im2col — stayed >=384 us, round-1 sweep). The
reference's answer to shapes the vendor library handles badly is a
specialized kernel per shape (cpp/int8conv/check.cu:31-50, a dedicated 3x3
tensor-core path); this module is the TPU analogue for the stem, built from
space-to-depth algebra:

  * fold the padded input 8x8 into channels: (N,232,232,3) -> (N,29,29,192)
  * the 7x7 stride-2 conv becomes a DENSE 2x2 stride-1 VALID conv with
    weights (2,2,192,1024) whose output is the 4x4 space-to-depth of the
    true (N,112,112,64) stem output:
      out2[M,Q,(py,px,k)] = sum_{i,j,ry,rx,c}
          xf[M+i, Q+j, (ry,rx,c)] * w[8i+ry-2py, 8j+rx-2px, c, k]
    (zero where the 7x7 tap index leaves [0,6]). 49 of 256 tap slots are
    live -> 5.2x MAC inflation, but the conv now has C=192/K=1024 — a
    shape XLA's int8 conv emitters run at ~72% SOL — so the conv drops
    446 -> 139 us at batch 32 (measured).
  * the 3x3/s2 maxpool consumes the 4x4 phase layout directly in a Pallas
    kernel (kernels/pool_phase.py) without a depth-to-space transpose.

Measured (v5e, conv+requant+pool chain): batch 32 classic 521 us vs s2d8
227 us (2.3x); batch 128 classic 737 us vs s2d8 909 us (0.81x) — the 5.2x
MAC inflation overtakes the per-op wins once XLA's classic path is fed
enough rows, so stem_backend="auto" routes batch<=64 to s2d8 and larger
batches to the classic path. (An earlier 4x4-fold variant was bit-exact but
SLOWER than classic at every batch — C=48 starves the 128-lane MXU; kept
only in the git history.)

Everything is exact int8 algebra: the filter transform is a pure scatter of
int8 weight values (per-channel scales/bias tile 16x across the phase dim),
so s2d-stem output == classic-stem output bit-for-bit (tested).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QTensor

F = 8          # fold factor
P = F // 2     # output phases per dim at stride 2


def s2d_stem_filter(w: jax.Array) -> jax.Array:
    """(7,7,C,K) filter -> (2,2,F*F*C, P*P*K) s2d-form filter (exact scatter).

    Channel order of dim 2 is (ry, rx, c) [c minor]; dim 3 is (py, px, k)
    [k minor], matching space_to_depth_input / the phase-consuming pool.
    """
    import numpy as np

    kh, kw, c, k = w.shape
    assert (kh, kw) == (7, 7), "stem transform is for the 7x7 stride-2 conv"
    # static index map: slot (i,j,ry,rx,py,px) <- flat 7x7 tap u*7+v, or the
    # sentinel 49 (a zero row) where the tap index leaves [0,6]
    idx = np.full((2, 2, F, F, P, P), 49, np.int32)
    for i in range(2):
        for j in range(2):
            for ry in range(F):
                for rx in range(F):
                    for py in range(P):
                        for px in range(P):
                            u = F * i + ry - 2 * py
                            v = F * j + rx - 2 * px
                            if 0 <= u <= 6 and 0 <= v <= 6:
                                idx[i, j, ry, rx, py, px] = u * 7 + v
    w_ext = jnp.concatenate(
        [w.reshape(49, c, k), jnp.zeros((1, c, k), w.dtype)], axis=0)
    w2 = w_ext[jnp.asarray(idx)]               # (2,2,F,F,P,P,c,k)
    w2 = w2.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # (i,j,ry,rx,c,py,px,k)
    return w2.reshape(2, 2, F * F * c, P * P * k)


def space_to_depth_input(x: jax.Array) -> jax.Array:
    """int8 (N,224,224,C) -> conv-ready (N,29,29,F*F*C): pad 3 (conv pad)
    +5 (fold alignment to 232) then fold 8x8 into channels, (ry,rx,c)."""
    n, h, w, c = x.shape
    assert (h, w) == (224, 224), "stem fold is specialized to 224x224 input"
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    hf = 232 // F
    xp = xp.reshape(n, hf, F, hf, F, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, hf, hf, F * F * c)


def pool_s2d_phases(out2_v: jax.Array, *, interpret: bool = False,
                    use_pallas: bool = True) -> jax.Array:
    """3x3/s2/p1 maxpool of the virtual (N,112,112,K) image, computed on its
    4x4-s2d form (N,28,28,16K) int8 -> (N,56,56,K) int8."""
    if use_pallas:
        from lowbitdnn_project_tpu.kernels.pool_phase import pool_stem_phases
        return pool_stem_phases(out2_v, interpret=interpret)
    # XLA fallback (same algebra; measured 8x slower than the kernel)
    n, m_, q_, c16 = out2_v.shape
    k = c16 // 16
    o = out2_v
    blk = lambda p: o[:, :, :, p * 4 * k:(p + 1) * 4 * k]
    neg = jnp.full((n, 1, q_, 4 * k), -128, o.dtype)
    prev3 = jnp.concatenate([neg, blk(3)[:, :-1]], axis=1)
    re = jnp.maximum(jnp.maximum(prev3, blk(0)), blk(1))
    ro = jnp.maximum(jnp.maximum(blk(1), blk(2)), blk(3))
    rows = jnp.stack([re, ro], axis=2).reshape(n, 2 * m_, q_, 4 * k)
    cb = lambda p: rows[:, :, :, p * k:(p + 1) * k]
    negc = jnp.full((n, 2 * m_, 1, k), -128, o.dtype)
    prev3c = jnp.concatenate([negc, cb(3)[:, :, :-1]], axis=2)
    ce = jnp.maximum(jnp.maximum(prev3c, cb(0)), cb(1))
    co = jnp.maximum(jnp.maximum(cb(1), cb(2)), cb(3))
    return jnp.concatenate([ce, co], axis=3).reshape(n, 2 * m_, 2 * q_, k)


def stem_conv_pool_s2d(
    x_q: QTensor,                      # (N, 224, 224, 3) int8, per-tensor
    w_q: QTensor,                      # (7, 7, 3, 64) int8, axis=3 scales
    bias: Optional[jax.Array],
    out_scale: jax.Array,
    *,
    relu: bool = True,
    backend: str = "xla",
    interpret: bool = False,
) -> QTensor:
    """Fused s2d stem: conv 7x7/s2/p3 + ReLU + requant + maxpool 3x3/s2/p1.

    Returns the int8 QTensor (N, 56, 56, 64) that feeds layer1 — bit-exact
    vs qconv2d(stride=2,padding=3) + qmax_pool2d(3,2,1). Requant-then-pool
    equals pool-then-requant because requantization is monotone.
    """
    from lowbitdnn_project_tpu.ops.conv import qconv2d

    kh, kw, c, k = w_q.shape
    x8 = space_to_depth_input(x_q.values)
    w2 = s2d_stem_filter(w_q.values)
    ws = jnp.broadcast_to(w_q.scale_vector().reshape(-1), (k,))
    w2_q = QTensor(values=w2,
                   scale=jnp.tile(ws, P * P).reshape(1, 1, 1, P * P * k),
                   bits=w_q.bits, axis=3)
    x8_q = QTensor(values=x8, scale=x_q.scale)
    bias16 = None if bias is None else jnp.tile(jnp.asarray(bias), P * P)
    out2 = qconv2d(x8_q, w2_q, bias16, stride=1, padding=0, relu=relu,
                   out_scale=out_scale, backend=backend, interpret=interpret)
    pooled = pool_s2d_phases(out2.values, interpret=interpret,
                             use_pallas=True)
    return QTensor(values=pooled, scale=jnp.asarray(out_scale, jnp.float32))
