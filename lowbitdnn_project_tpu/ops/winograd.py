"""Quantized Winograd F(2x2, 3x3) convolution in the transform domain.

Reference parity: the fused quantized Winograd CUDA kernel
(cpp/int8conv/conv2DForward3x3WinogradFused.cuh) — in-kernel BᵀdB data
transform quantized to int8 (:407-438), GgGᵀ filter transform with scaled
rows (:461-494), transform-domain elementwise product via dp4a (:594-608),
fused Aᵀ(.)A output transform + rescale (:620-624) — and the sympy
derivation tool (wincnn.py:10-57).

TPU re-expression: the 16 transform-domain "elementwise" products are 16
independent (tiles x C) @ (C x K) matmuls — ideal MXU food as one batched
dot_general. Data/output transforms are integer butterflies (B and A have
0/±1 entries) fused by XLA into the tile gather/scatter.

Arithmetic: 16*C*K MACs per 2x2-output tile vs 36*C*K direct = 2.25x fewer.

Modes:
  int16 — V kept in int16 (exact: |BᵀdB| <= 4*127 = 508), U as int16
          (4*GgGᵀ is integer for integer g). Bit-exact integer Winograd.
  int8  — V and U requantized to int8 with per-tile-position scales
          (the reference's scheme; small extra quantization error, full
          int8 MXU rate). Gate with accuracy tests per BASELINE config 5.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.quant.qtensor import QTensor

# F(2x2,3x3) transform matrices (wincnn.py:10-24):
#   Y = Aᵀ [ (G g Gᵀ) ⊙ (Bᵀ d B) ] A
# numpy (not jnp) module-level constants: creating device arrays at import
# time initializes the XLA backend, which breaks jax.distributed.initialize
# in multi-process workers (parallel/multihost.py)
G = np.asarray([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
               np.float32)
BT = np.asarray([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
                np.float32)
AT = np.asarray([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def filter_transform(w: jax.Array) -> jax.Array:
    """GgGᵀ per (cin, cout): (3,3,C,K) -> (4,4,C,K) float."""
    return jnp.einsum("ij,jkcn,lk->ilcn", G, w, G)


def wino_quantize_filter(
    w_q: QTensor,
    mode: str = "int8",
) -> Tuple[jax.Array, jax.Array]:
    """Transform + quantize an int8 HWIO filter into the Winograd domain.

    Returns (U, u_scale): U is (16, C, K) int8 (mode="int8", per-position+
    per-channel scales (16, 1, K)) or int16 holding exact 4*GgGᵀ
    (mode="int16", scalar scale array (16,1,K) = w_scale/4).
    """
    kh, kw, c, k = w_q.shape
    assert (kh, kw) == (3, 3), "Winograd path is 3x3 only"
    # int16-exact mode accumulates |V|*|U| <= 508*1143 per channel in int32:
    # C beyond ~3698 could overflow; guard the "exact" claim
    if mode == "int16" and c > 3698:
        raise ValueError(f"int16 winograd mode exact only for C<=3698, got {c}")
    if mode == "int16":
        # 4*G g Gᵀ is exactly integer for integer g (2G has integer entries)
        g2 = (2.0 * G)
        u_int = jnp.einsum("ij,jkcn,lk->ilcn", g2, w_q.values.astype(jnp.int32),
                           g2).astype(jnp.int16)
        u = u_int.reshape(16, c, k)
        ws = jnp.broadcast_to(
            w_q.scale_vector().reshape(-1), (k,)).reshape(1, 1, k)
        u_scale = jnp.broadcast_to(ws / 4.0, (16, 1, k))
        return u, u_scale
    if mode != "int8":
        raise ValueError(mode)
    u_f = filter_transform(w_q.dequantize())          # (4,4,C,K) float
    u_f = u_f.reshape(16, c, k)
    absmax = jnp.max(jnp.abs(u_f), axis=1, keepdims=True)  # (16,1,K)
    u_scale = jnp.maximum(absmax, 1e-12) / 127.0
    u = jnp.clip(jnp.round(u_f / u_scale), -127, 127).astype(jnp.int8)
    return u, u_scale


def wino_range_report(qparams) -> dict:
    """Per-layer ±4σ transform-domain range analysis on trained weights.

    The reference justifies its transform-domain int8 ranges by measuring
    how much of the GgGᵀ-transformed weight distribution a ±4σ window
    covers (weights.py:8-26, plotted over ResNet-34 3x3 layers). This is
    that analysis as a function: walk a quantized param pytree, and for
    every 3x3 conv report, over the 16 Winograd tile positions,
      * sigma4_cover — fraction of |U| values within 4σ of their (zero)
        mean, worst position (reference's headline number; ≈1.0 means the
        ±4σ window loses almost nothing),
      * absmax_over_4sigma — absmax/4σ, worst position (heavy-tail factor:
        how much grid the absmax scale wastes vs a ±4σ clip),
      * u_int8_relerr — ||U - Q8(U)||/||U|| with the shipped per-position
        per-out-channel scales (wino_quantize_filter mode="int8"): the
        actual transform-domain weight quantization error.
    The model-level gate (top-1 via wino_mode="int8") lives in
    examples/accuracy_parity.py; this report documents per-layer safety.
    """
    report = {}

    def visit(node, path):
        from lowbitdnn_project_tpu.models.layers import QConvParams
        if isinstance(node, QConvParams):
            kh, kw = node.weight.shape[:2]
            if (kh, kw) != (3, 3):
                return
            w = np.asarray(node.weight.dequantize(), np.float64)
            u = np.einsum("ij,jkcn,lk->ilcn", G, w, G).reshape(16, -1)
            sig = u.std(axis=1) + 1e-12                # per position
            cover = (np.abs(u) <= 4.0 * sig[:, None]).mean(axis=1)
            ratio = np.abs(u).max(axis=1) / (4.0 * sig)
            uq, us = wino_quantize_filter(node.weight, mode="int8")
            u8 = (np.asarray(uq, np.float64)
                  * np.asarray(us, np.float64)).reshape(16, -1)
            u_f = np.asarray(
                filter_transform(node.weight.dequantize()),
                np.float64).reshape(16, -1)
            relerr = float(np.linalg.norm(u8 - u_f) /
                           (np.linalg.norm(u_f) + 1e-30))
            report[path] = {
                "sigma4_cover_min": round(float(cover.min()), 5),
                "absmax_over_4sigma_max": round(float(ratio.max()), 3),
                "u_int8_relerr": round(relerr, 5),
            }
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(v, f"{path}[{i}]")

    visit(qparams, "")
    return report


def _data_transform_int(tiles: jax.Array) -> jax.Array:
    """BᵀdB on int tiles: (16, M, C) int16 from (4, 4, M, C) int16.

    Integer butterfly (B entries are 0/±1): rows then columns.
    """
    d = tiles.astype(jnp.int16)
    # rows: e_i = BT @ d  (over the first 4x index)
    r0 = d[0] - d[2]
    r1 = d[1] + d[2]
    r2 = d[2] - d[1]
    r3 = d[1] - d[3]
    rows = [r0, r1, r2, r3]                           # each (4, M, C)
    out = []
    for r in rows:                                    # columns: (.) @ B
        out.extend([r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]])
    return jnp.stack(out)                             # (16, M, C)


def _extract_tiles(x: jax.Array, th: int, tw: int) -> jax.Array:
    """(N, H+2, W+2, C) padded int8 -> (4, 4, N*TH*TW, C) int tiles,
    tile (ty,tx) covering rows 2ty..2ty+3 (stride-2 overlapping 4x4)."""
    n, _, _, c = x.shape
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            s = jax.lax.slice(
                x, (0, i, j, 0),
                (n, i + 2 * (th - 1) + 1, j + 2 * (tw - 1) + 1, c),
                (1, 2, 2, 1))
            cols.append(s.reshape(n * th * tw, c))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)                            # (4,4,M,C)


def qconv2d_winograd(
    x_q: QTensor,                  # (N,H,W,C) int8, per-tensor scale
    u: jax.Array,                  # (16, C, K) int8/int16 transformed filter
    u_scale: jax.Array,            # (16, 1, K)
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    mode: str = "int8",
):
    """3x3 stride-1 pad-1 conv via quantized Winograd F(2x2,3x3).

    H and W must be even (2x2 output tiling). Returns float array or int8
    QTensor like qconv2d.
    """
    n, h, w, c = x_q.shape
    assert h % 2 == 0 and w % 2 == 0, "H, W must be even for F(2x2,3x3)"
    th, tw = h // 2, w // 2
    x_p = jnp.pad(x_q.values, ((0, 0), (1, 1), (1, 1), (0, 0)))

    tiles = _extract_tiles(x_p, th, tw)               # (4,4,M,C) int8
    v16 = _data_transform_int(tiles)                  # (16,M,C) int16, exact

    if mode == "int8":
        # requantize V per tile-position (reference per-group scales,
        # WinogradFused.cuh:548-549): |V| <= 508 so sv = 4*x_scale keeps
        # round(V/4) within int8
        v = jnp.clip(jnp.round(v16.astype(jnp.float32) / 4.0),
                     -127, 127).astype(jnp.int8)
        v_scale = 4.0 * x_q.scale
    elif mode == "int16":
        v = v16
        v_scale = x_q.scale
    else:
        raise ValueError(mode)

    # 16 batched matmuls on the MXU: (16, M, C) @ (16, C, K) -> (16, M, K)
    m = jax.lax.dot_general(
        v, u, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    m_f = m.astype(jnp.float32) * (v_scale * u_scale)  # (16, M, K)

    # output transform Aᵀ (.) A — float butterfly over the 16 positions
    mm = m_f.reshape(4, 4, n * th * tw, -1)
    # rows: AT @ m
    r0 = mm[0] + mm[1] + mm[2]
    r1 = mm[1] - mm[2] - mm[3]
    y = []
    for r in (r0, r1):                                # cols: (.) @ A
        y.append(r[0] + r[1] + r[2])
        y.append(r[1] - r[2] - r[3])
    k = y[0].shape[-1]
    out = jnp.stack(y).reshape(2, 2, n, th, tw, k)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(n, h, w, k)

    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    if out_scale is not None:
        q = jnp.clip(jnp.round(out / jnp.asarray(out_scale, jnp.float32)),
                     -127, 127).astype(jnp.int8)
        return QTensor(values=q, scale=jnp.asarray(out_scale, jnp.float32))
    return out.astype(out_dtype)
