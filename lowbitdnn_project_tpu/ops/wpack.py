"""Output-pair-packed 3x3 conv for channel-starved layers (C=64).

The MXU contracts 128 lanes and emits 128 lanes per pass; a 3x3 conv with
cin=64 AND cout=64 (ResNet layer1 body convs) therefore runs at <=50%
utilization no matter how well the emitter tiles it — both the contraction
and the output lane dim are half-empty. Measured in-chain: 55% SOL at
batch 128, and only ~29% standalone at batch 32 (BENCH_NOTES round 2).

This module reformulates the conv so the MXU is full:

  * pack two adjacent width-pixels into the lane dim:
      Xp[b, h, v, p*C + c] = xpad[b, h, 2v + p, c]        (lanes: 2C = 128)
    (a pure reshape of the w-padded row-major NHWC buffer — the relayout
    is a memory identity, only the pad writes new bytes)
  * expand the 3x3 kernel into a (3, 2, 2C, 2K) block kernel whose
    (p,c) -> (j,o) block holds w[dy, 2q+p-j, c, o] when 2q+p-j is a valid
    tap (6 of 8 blocks live): one packed output pixel then carries BOTH
    y[2v] and y[2v+1], so the conv computes two output pixels per MXU row
    at full 128-lane contraction and full output width.

Useful-MAC ceiling: 75% (vs 50% for the classic formulation); performed
MACs inflate 4/3 but run ~2x denser. Measured with the requant epilogue
fused (bench/probes/wpack_probe2.py, TPU v5e, b32 56x56x64->64): classic XLA
58.7 us (126 useful TOPS) vs packed-DOMAIN-RESIDENT 25.2 us (293 useful
TOPS, ~100% performed MXU) — the one standard-shape formulation that
beats XLA's own conv emitter, because the emitter cannot re-associate
output pixels into the lane dim by itself. The caveat: entering/leaving
the packed domain costs ~105 us at b32 (the (..,W,64)<->(..,W/2,128)
reshapes are genuine tiled-memory relayouts), so a LONE wpack conv at
classic boundaries loses (130 us; sweep config "wpack") — the win exists
only while tensors stay packed, which is what qbottleneck_wpack arranges.

Reference anchor: this is the same move as the reference's NCHW_VECT_C
int8x4 repacking (python/qtorch/nn/functional/utils.py:5-18) — reshape the
tensor so the fixed-function contraction unit is fed full words — applied
to the MXU's output dim instead of dp4a's input dim.
"""
from typing import Optional, Union

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QTensor

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def pack_wpair_weights(w: jax.Array) -> jax.Array:
    """(3, 3, C, K) -> (3, 2, 2C, 2K) block kernel for the w-paired conv.

    Block (p, c) -> (j, o) holds w[dy, dx, c, o] with dx = 2q + p - j when
    0 <= dx <= 2, else zero (6 of the 8 (q, p, j) combos are live).
    """
    kh, kw, c, k = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"pack_wpair_weights needs a 3x3 kernel, got {w.shape}")
    wp = jnp.zeros((3, 2, 2 * c, 2 * k), w.dtype)
    for q in range(2):
        for p in range(2):
            for j in range(2):
                dx = 2 * q + p - j
                if 0 <= dx <= 2:
                    wp = wp.at[:, q, p * c:(p + 1) * c,
                               j * k:(j + 1) * k].set(w[:, dx])
    return wp


def qconv3x3_wpack(
    x_q: QTensor,
    w_q: QTensor,
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    wpack: Optional[jax.Array] = None,
) -> Union[jax.Array, QTensor]:
    """3x3 stride-1 pad-1 int8 conv in output-pair-packed form.

    Bit-identical to qconv2d(..., stride=1, padding=1, backend="xla"):
    same int32 accumulation, same dequant+bias+ReLU(+requant) epilogue —
    only the MXU-facing layout differs. Requires even W.

    `wpack`: optional pre-packed (3, 2, 2C, 2K) kernel (from
    pack_wpair_weights at param-quantization time) to keep the 6-block
    scatter out of the traced graph.
    """
    n, h, wdim, c = x_q.shape
    kh, kw, wc, k = w_q.shape
    if (kh, kw) != (3, 3) or wc != c:
        raise ValueError(f"qconv3x3_wpack: weight {w_q.shape} does not match "
                         f"3x3 over input {x_q.shape}")
    if wdim % 2:
        raise ValueError(f"qconv3x3_wpack needs even W, got {wdim}")

    wp = wpack if wpack is not None else pack_wpair_weights(w_q.values)
    # pad width by 1 on each side; the reshape to (.., (W+2)/2, 2C) is a
    # memory identity on the row-major NHWC buffer
    xp = jnp.pad(x_q.values, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xp = xp.reshape(n, h, (wdim + 2) // 2, 2 * c)
    acc = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=DIMSPEC, preferred_element_type=jnp.int32)

    # epilogue in packed layout (int8 out => half the unpack bytes);
    # shared with qbottleneck_wpack so the two paths cannot desynchronize
    out = _packed_epilogue(acc, x_q.scale, w_q, bias, relu, out_scale)
    if out_scale is not None:
        out = out.reshape(n, h, wdim, k)  # unpack: memory identity
        return QTensor(values=out, scale=jnp.asarray(out_scale, jnp.float32),
                       bits=8, axis=None)
    return out.reshape(n, h, wdim, k).astype(out_dtype)


# ---------------------------------------------------------------- triple
# A lone packed conv loses e2e: the (.., W, 64) <-> (.., W/2, 128) pack and
# unpack are genuine relayouts in TPU tiled memory (sub-128 minor dims are
# lane-padded, so the reshape is NOT a memory identity on device), and each
# costs more than the conv win. The fix: the bottleneck's surrounding 1x1
# convs absorb the layout change at zero extra MAC cost, because a 1x1 with
# a 64-wide dim is itself half-starved either way:
#   c1 (1x1 A->64): becomes a stride-(1,2) kernel-(1,2) conv (A -> 128)
#     whose two kernel columns write the two pack slots -> emits the packed
#     layout directly. Same 50% useful-MAC ratio as the classic N=64 form.
#   c2 (3x3 64->64): the wpack conv above -- 75% ceiling vs 50%.
#   c3 (1x1 64->B): becomes a block-diagonal 128 -> 2B conv on the packed
#     input; its (W/2, 2B) output reshapes to (W, B) along 128-aligned lane
#     groups (a real memory identity). Same 50% ratio as the classic K=64.
# Measured (bench/probes/wpack_triple_probe.py, bit-exact, interleaved min):
# full l1 triple 1.82x at b8, 1.67x at b32, 1.03x at b128.
#
# E2E VERDICT (bench/probes/wpack_ab2.py, interleaved min-of-2): routing the
# packed triple into the full ResNet-50 int8 chain LOSES at b32 — 2164 us
# vs 1268 us classic (with fused stem; 2598 vs 1854 with classic stem).
# In-chain, XLA fuses the classic blocks into cross-layer neighborhoods
# the packed formulation breaks — the same probe-vs-e2e mis-ranking as
# the 1x1 Pallas routing (BENCH_NOTES round 2). Chain routing therefore
# defaults OFF (resnet.apply_quantized_int8chain use_wpack=False); the
# standalone conv win (295 vs 116 useful TOPS) stands as measured.


def pack_entry_1x1_weights(w: jax.Array) -> jax.Array:
    """(1, 1, A, K) -> (1, 2, A, 2K): kernel col q writes pack slot p=q."""
    a, k = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 2, a, 2 * k), w.dtype)
    wp = wp.at[0, 0, :, :k].set(w[0, 0])
    wp = wp.at[0, 1, :, k:].set(w[0, 0])
    return wp


def pack_exit_1x1_weights(w: jax.Array) -> jax.Array:
    """(1, 1, C, B) -> (1, 1, 2C, 2B): block-diagonal (p == j)."""
    c, b = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 2 * c, 2 * b), w.dtype)
    wp = wp.at[0, 0, :c, :b].set(w[0, 0])
    wp = wp.at[0, 0, c:, b:].set(w[0, 0])
    return wp


def _packed_epilogue(acc, x_scale, w_q, bias, relu, out_scale):
    """dequant+bias+relu+requant on a (..., 2K) packed accumulation."""
    k = w_q.shape[3]
    ws = w_q.scale_vector()
    scale = jnp.broadcast_to(
        (x_scale * ws).astype(jnp.float32).reshape(-1), (k,))
    out = acc.astype(jnp.float32) * jnp.tile(scale, 2)
    if bias is not None:
        out = out + jnp.tile(jnp.asarray(bias, jnp.float32), 2)
    if relu:
        out = jnp.maximum(out, 0.0)
    if out_scale is None:
        return out
    q = jnp.round(out * (1.0 / jnp.asarray(out_scale, jnp.float32)))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def qbottleneck_wpack(
    x_q: QTensor,
    p1, p2, p3,                      # QConvParams: 1x1 A->C, 3x3 C->C, 1x1 C->B
    s2, s3,                          # requant scales after c1 / c2
    *,
    out_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    identity: Optional[QTensor] = None,
) -> Union[jax.Array, QTensor]:
    """Bottleneck main branch (c1+relu, c2+relu, c3) in w-paired packed
    layout, bit-identical to the three classic qconv2d calls. Requires
    even W and cmid <= 64.

    identity: optional int8 residual input (N, H, W, B). When given, the
    block tail runs in the INT8 add domain (the chain's add_domain="int8"
    semantics): c3 requants at out_scale inside the packed epilogue, the
    identity is rescaled to out_scale, and the two sum in int16 with
    clip(0,127) as the ReLU. Why not a float add: the identity's
    (W, B) -> (W/2, 2B) regroup and the packed float h are both genuine
    tiled-memory relayouts/materializations — a float packed-domain tail
    measured +294 us/block at b32 vs +30 us for the classic fused float
    add. The int8 tail instead rides the unpack write (+~30 us/block) and
    keeps the packed-conv win. Numerics match the classic
    add_domain="int8" tail exactly."""
    n, h, wdim, a = x_q.shape
    c = p2.weight.shape[2]
    if wdim % 2 or 2 * c > 128:
        raise ValueError(f"qbottleneck_wpack: needs even W and cmid<=64, "
                         f"got W={wdim}, cmid={c}")

    w1p = pack_entry_1x1_weights(p1.weight.values)
    w2p = pack_wpair_weights(p2.weight.values)
    w3p = pack_exit_1x1_weights(p3.weight.values)

    # c1: emit packed odd-even layout, width W/2+1 (w-pad 1,1 under the
    # stride-2 width-2 kernel); border half-columns carry conv-over-pad
    # results (= bias after the epilogue) and must be zeroed for c2
    acc1 = jax.lax.conv_general_dilated(
        x_q.values, w1p, (1, 2), ((0, 0), (1, 1)),
        dimension_numbers=DIMSPEC, preferred_element_type=jnp.int32)
    h1 = _packed_epilogue(acc1, x_q.scale, p1.weight, p1.bias, True, s2)
    mask = jnp.ones((wdim // 2 + 1, 2 * c), jnp.int8)
    mask = mask.at[0, :c].set(0).at[wdim // 2, c:].set(0)
    h1 = h1 * mask

    acc2 = jax.lax.conv_general_dilated(
        h1, w2p, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=DIMSPEC, preferred_element_type=jnp.int32)
    h2 = _packed_epilogue(acc2, jnp.asarray(s2, jnp.float32), p2.weight,
                          p2.bias, True, s3)

    acc3 = jax.lax.conv_general_dilated(
        h2, w3p, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=DIMSPEC, preferred_element_type=jnp.int32)
    b = p3.weight.shape[3]
    if identity is not None:
        if out_scale is None:
            raise ValueError("identity-fused tail requires out_scale")
        out_scale = jnp.asarray(out_scale, jnp.float32)
        hq = _packed_epilogue(acc3, jnp.asarray(s3, jnp.float32), p3.weight,
                              p3.bias, False, out_scale)
        hq = hq.reshape(n, h, wdim, b)          # int8 unpack
        r = jnp.round(identity.values.astype(jnp.float32)
                      * (identity.scale / out_scale))
        id_rs = jnp.clip(r, -127, 127).astype(jnp.int8)
        sum16 = hq.astype(jnp.int16) + id_rs.astype(jnp.int16)
        out = jnp.clip(sum16, 0, 127).astype(jnp.int8)
        return QTensor(values=out, scale=out_scale, bits=8, axis=None)
    out = _packed_epilogue(acc3, jnp.asarray(s3, jnp.float32), p3.weight,
                           p3.bias, False, out_scale)
    out = out.reshape(n, h, wdim, b)    # 128-aligned lane regroup: identity
    if out_scale is not None:
        return QTensor(values=out, scale=jnp.asarray(out_scale, jnp.float32),
                       bits=8, axis=None)
    return out.astype(out_dtype)
