"""Quantized 2D convolution — the engine's central op.

Capability parity with the reference's conv stack:
  * int8 x int8 -> int32 accumulation (cuDNN INT8x4 CONFIG at
    python/qtorch/cpp/conv2d.cuh:124-142, WMMA kernel at
    cpp/int8conv/conv2DForward3x3TensorCores.cuh)
  * dequant folded into the epilogue (alpha = in_scale*w_scale,
    conv2d.cuh:147-155), upgraded here to per-output-channel scales
  * "external" float output vs pure-int8 requantized output
    (qconv2d.py "external"/"internal" configs; df-optimization/Int8Conv2d.py
    takes & returns scale) — selected by ``out_scale``
  * fused bias/ReLU epilogue (conv2DForward3x3Fused.cuh:216)

TPU design: NHWC activations, HWIO weights (C and K land on the 128-lane
minor dimension). Three execution paths:
  * ``xla``  — lax.conv_general_dilated on int8 with int32 accumulation;
               correctness oracle everywhere, and the fallback off-TPU.
  * ``gemm`` — im2col (tap-stacking, exact) + the Pallas fused int8 GEMM
               (kernels/matmul_int8.py); the MXU fast path.
  * ``auto`` — gemm on TPU, xla elsewhere.
Depthwise convs (feature_group_count == C) take the XLA path — they are
VPU/bandwidth-bound, not MXU work; measured XLA int8 depthwise already sits
at the VPU scalar-MAC roofline (~1.8 T op/s), so no dedicated kernel exists
by design (see CLAUDE.md "Depthwise: CLOSED").
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QTensor
from lowbitdnn_project_tpu.kernels.matmul_int8 import (
    int8_matmul_fused,
    int8_matmul_xla,
)

# NHWC activations, HWIO weights, NHWC outputs.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d_int32(
    x: jax.Array,            # (N, H, W, C) int8
    w: jax.Array,            # (KH, KW, C/groups, K) int8
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
) -> jax.Array:
    """Integer conv core: int8 inputs, exact int32 accumulation (XLA).

    The TPU analogue of the reference's int32-accumulating kernels; also the
    test oracle (replaces refConv2DForward.hpp's role of "trusted slow conv").
    """
    ph, pw = padding
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation,
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


def im2col(
    x: jax.Array,            # (N, H, W, C)
    ksize: Tuple[int, int],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Stack the KH*KW taps into the channel dim: (N, OH, OW, KH*KW*C).

    Tap-stacking is exact (pure data movement) and turns any conv into one
    GEMM — the TPU-native analogue of the reference's NCHW_VECT_C repacking
    (python/qtorch/nn/functional/utils.py:5-18) + implicit-GEMM algorithm
    choice (conv2d.cuh:142 IMPLICIT_PRECOMP_GEMM).
    """
    n, h, wd, c = x.shape
    kh, kw = ksize
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (wd + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    taps = []
    for i in range(kh):
        for j in range(kw):
            di, dj = i * dh, j * dw
            taps.append(jax.lax.slice(
                x,
                (0, di, dj, 0),
                (n, di + (oh - 1) * sh + 1, dj + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            ))
    return jnp.concatenate(taps, axis=-1), (oh, ow)


def _combined_scale(x_q: QTensor, w_q: QTensor, out_ch: int) -> jax.Array:
    """Per-output-channel combined scale: in_scale * w_scale[k].

    The reference's qconv_scale = iscale*wscale (qconv2d.py:67,
    quantization.py:8-15), vectorized over output channels.
    """
    if x_q.axis is not None:
        raise NotImplementedError(
            "per-channel activation scales take the group-split XLA path "
            "in qconv2d/qlinear, not the combined-scale epilogue")
    ws = w_q.scale_vector()
    return jnp.broadcast_to(
        (x_q.scale * ws).astype(jnp.float32).reshape(-1), (out_ch,))


def qconv2d(
    x_q: QTensor,
    w_q: QTensor,
    bias: Optional[jax.Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    relu: bool = False,
    out_scale: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
    backend: str = "auto",
    wino_u: Optional[Tuple[jax.Array, jax.Array]] = None,
    out_unsigned: bool = False,
    zp_fold: str = "acc",
    act_group_size: int = 32,
    interpret: bool = False,
) -> Union[jax.Array, QTensor]:
    """Quantized conv with fused dequant+bias+ReLU(+requant) epilogue.

    Args:
      x_q: int8 activations, NHWC, per-tensor scale. May carry a zero_point
        (asymmetric "uint8" activations — the reference's uint8x4 configs,
        cpp/apps/config.json:55-80 / conv2DForward3x3Fused.cuh:15-60). The
        zp is corrected exactly in the epilogue: acc -= zp * row_sum(w)[k]
        (precomputable per-channel int32 sums), with zero-padding done at
        the zp value so borders represent real 0.
      w_q: int8 weights, HWIO, per-tensor or per-out-channel (axis=3) scale.
      bias: float bias of shape (K,), added after dequantization.
      out_scale: if given, requantize the output with this scale and return
        an int8 QTensor ("internal"/pure-int8 mode); else return float
        ("external" mode). Matches the reference's two output configs.
      out_unsigned: with out_scale and relu, emit an asymmetric QTensor
        (zero_point=-128) — the outputs are one-sided post-ReLU, so this
        spends all 256 levels on [0, out_scale*255].
      act_group_size: channel-group width for per-channel ACTIVATION scales
        (x_q.axis == 3). The reference's fused kernel quantizes activations
        with per-4-channel-group scales (conv2DForward3x3Fused.cuh:15-31);
        here a per-channel activation scale must be CONSTANT within each
        group of ``act_group_size`` channels (quant.group_channel_scale
        builds one), and the conv runs exactly as one int8 conv per group
        with the group scales applied in a weighted sum — per-group int32
        accumulation, no requantization error. 32 is the TPU sublane-
        friendly default (the reference's 4 would fragment the MXU
        contraction 8x further). Capability path, XLA backend only: G
        partial convs cost more than one full conv — use per-tensor
        activation scales (possibly asymmetric) on the fast path.
      zp_fold: how the asymmetric zero-point correction is applied.
        "acc" (default) pads with the static zp value and subtracts
        zp*row_sum(w) on the int32 accumulator — bit-matches the (q-zp)
        integer conv oracle exactly, and is the measured-best mode
        (uint8_e2e_ab_r5.json: 0.94x of the symmetric chain at b32 once
        the fused stem and the requant shift fold landed — r4's 2x price
        was those, NOT this correction). "bias" keeps the conv implicitly
        zero-padded and folds the correction into a position-dependent
        bias map out = acc*scale + (bias - zp*scale*Win) with
        Win = conv(ones, sum_c w) the per-position in-bounds tap sum —
        structurally symmetric, but MEASURED WORSE on both axes: the f32
        correction-map traffic costs 0.81x at b32 / 3.4x at b1, and
        acc_implicit ≈ acc_true - zp*Win cancels in float instead of
        int32, costing logit accuracy (0.0665 vs 0.0472 relerr). Kept as
        the documented negative result + graph-shape experiment.
      backend: "auto" | "xla" | "xla_gemm" (xla, but 1x1 s1 p0 convs run
        as dot_general — e2e-A/B'd routing experiment) | "gemm"
        (Pallas im2col GEMM) | "direct"
        (Pallas implicit-GEMM conv, stride 1, C%128==0) | "winograd"
        (fused Pallas F(2x2,3x3), stride 1 pad 1, even H/W, C%128==0)
        | "wpack" (output-pair-packed 3x3 s1 p1 for cin<=64, ops/wpack.py
        — the measured win for lane-starved layer1 body convs).
        "auto" picks XLA — measured fastest for standard convs on v5e
        (330-440 TOPS); the Pallas backends exist for shapes/fusions XLA
        cannot express and as tuning surfaces.
    """
    stride, padding, dilation = _pair(stride), _pair(padding), _pair(dilation)
    kh, kw, wc, k = w_q.shape
    n, h, wdim, c = x_q.shape
    if wc * groups != c:
        raise ValueError(
            f"qconv2d: weight in-channels ({wc}) x groups ({groups}) must "
            f"equal input channels ({c}); got input {x_q.shape} (NHWC), "
            f"weight {w_q.shape} (HWIO)")

    if zp_fold not in ("bias", "acc"):
        raise ValueError(f"zp_fold must be 'bias' or 'acc', got {zp_fold!r}")
    act_pc = x_q.axis is not None
    if act_pc:
        if (x_q.axis % x_q.ndim) != 3:
            raise NotImplementedError(
                "per-channel activation scales must live on the channel "
                f"axis (3); got axis {x_q.axis}")
        if x_q.zero_point is not None:
            raise NotImplementedError(
                "per-channel asymmetric activations unsupported")
        if groups != 1:
            raise NotImplementedError(
                "per-channel activation scales: groups must be 1")
        # epilogue scale carries only the weight part; the activation group
        # scales enter through the group-split weighted sum below
        scale = jnp.broadcast_to(
            jnp.asarray(w_q.scale_vector(), jnp.float32).reshape(-1), (k,))
    else:
        scale = _combined_scale(x_q, w_q, k)
    requant = out_scale is not None
    if out_unsigned and not (requant and relu):
        raise ValueError("out_unsigned requires out_scale and relu "
                         "(uint8 output is for one-sided post-ReLU data)")

    if (x_q.zero_point is not None or out_unsigned or act_pc) and backend in (
            "auto", "gemm", "direct", "winograd", "wpack", "xla_gemm"):
        # Asymmetric and per-channel-scaled activations ride the XLA path
        # (the measured-fastest default anyway); the Pallas lab kernels are
        # symmetric-per-tensor-int8-only.
        backend = "xla"

    if backend == "auto":
        # XLA's TPU conv emitters measured at/near speed-of-light for the
        # standard shapes; route there by default. Standalone per-layer
        # probes (bench/one_by_one_probe.py) suggested Pallas wins on some
        # 1x1 shapes, but e2e A/B at batch 128 shows inserting a Pallas
        # call mid-chain LOSES (5.93 -> 6.53 ms ResNet-50: the custom call
        # breaks XLA's fusion neighborhood); standalone dispatch timings
        # overstate the in-graph cost of XLA convs. Only e2e A/B counts.
        backend = "xla"

    if backend == "direct":
        from lowbitdnn_project_tpu.kernels.conv_direct import conv2d_direct_int8

        if groups != 1 or stride != (1, 1) or dilation != (1, 1):
            raise NotImplementedError("direct path: stride/dilation/groups")
        if kh != kw or padding[0] != padding[1]:
            raise NotImplementedError("direct path: square kernel/padding")
        out = conv2d_direct_int8(
            x_q.values, w_q.values, scale, bias, out_scale,
            kh=kh, kw=kw, padding=padding[0], relu=relu, requant=requant,
            out_dtype=out_dtype, interpret=interpret)
    elif backend == "winograd":
        from lowbitdnn_project_tpu.kernels.winograd_fused import (
            conv3x3_winograd_fused)
        from lowbitdnn_project_tpu.ops.winograd import wino_quantize_filter

        if (kh, kw) != (3, 3) or stride != (1, 1) or padding != (1, 1) \
                or groups != 1 or dilation != (1, 1):
            raise NotImplementedError("winograd path: 3x3 s1 p1 only")
        # prefer pre-transformed weights (wino_u) — transforming here costs
        # a full GgGt + absmax pass per forward call under jit
        u, us = wino_u if wino_u is not None else \
            wino_quantize_filter(w_q, mode="int8")
        if u.dtype != jnp.int8:
            # int16-mode U would be silently clipped to +-127 and scaled
            # wrongly by the fused kernel (it assumes int8-mode U); fail loud
            raise ValueError(
                f"winograd backend needs wino_u from wino_quantize_filter("
                f"mode='int8') (int8 U); got dtype {u.dtype}")
        out = conv3x3_winograd_fused(
            x_q.values, u, us, x_q.scale, bias, out_scale,
            relu=relu, requant=requant, out_dtype=out_dtype,
            interpret=interpret)
    elif backend == "gemm":
        if groups != 1:
            raise NotImplementedError("gemm path: groups must be 1")
        if (kh, kw) == (1, 1) and stride == (1, 1) and padding == (0, 0):
            patches = x_q.values.reshape(n * h * wdim, c)
            oh, ow = h, wdim
        else:
            patches, (oh, ow) = im2col(
                x_q.values, (kh, kw), stride, padding, dilation)
            patches = patches.reshape(n * oh * ow, kh * kw * c)
        wmat = w_q.values.reshape(kh * kw * wc, k)
        out = int8_matmul_fused(
            patches, wmat, scale, bias, out_scale,
            relu=relu, requant=requant, out_dtype=out_dtype,
            interpret=interpret)
        out = out.reshape(n, oh, ow, k)
    elif backend == "wpack":
        from lowbitdnn_project_tpu.ops.wpack import qconv3x3_wpack

        if (kh, kw) != (3, 3) or stride != (1, 1) or padding != (1, 1) \
                or groups != 1 or dilation != (1, 1):
            raise NotImplementedError("wpack path: 3x3 s1 p1 only")
        return qconv3x3_wpack(x_q, w_q, bias, relu=relu, out_scale=out_scale,
                              out_dtype=out_dtype)
    elif backend in ("xla", "xla_gemm"):
        gemm1x1 = (backend == "xla_gemm" and (kh, kw) == (1, 1)
                   and stride == (1, 1) and padding == (0, 0)
                   and groups == 1 and x_q.zero_point is None)
        zp = x_q.zero_point
        if act_pc:
            # group-split conv: one exact int8 conv per activation scale
            # group, group scales applied in a float weighted sum of the
            # int32 partials — the reference's per-group fused-quantize
            # algebra (conv2DForward3x3Fused.cuh:15-31,216) on TPU terms
            gs = min(act_group_size, c)
            if c % gs:
                raise ValueError(
                    f"act_group_size {gs} must divide input channels {c}")
            ngrp = c // gs
            sx = x_q.scale_vector().reshape(ngrp, gs)[:, 0]
            partials = jnp.stack([
                conv2d_int32(
                    jax.lax.slice_in_dim(x_q.values, g * gs, (g + 1) * gs,
                                         axis=3),
                    jax.lax.slice_in_dim(w_q.values, g * gs, (g + 1) * gs,
                                         axis=2),
                    stride, padding, dilation, 1)
                for g in range(ngrp)])                 # (G, N, OH, OW, K)
            acc = jnp.tensordot(sx.astype(jnp.float32),
                                partials.astype(jnp.float32), axes=1)
        elif gemm1x1:
            # 1x1 conv as dot_general: the reshape is a free view and the
            # GEMM emitter measured +10% on K>=256 deep-layer shapes
            # (bench/probes/one_by_one_ablate.py) — routing decided by e2e
            # A/B only (probe-vs-e2e mis-rank rule)
            acc = jax.lax.dot_general(
                x_q.values.reshape(n * h * wdim, c),
                w_q.values.reshape(c, k),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(n, h, wdim, k)
        elif zp is None:
            acc = conv2d_int32(
                x_q.values, w_q.values, stride, padding, dilation, groups)
        elif zp_fold == "acc":
            # exact int32-domain correction (the r4 path): pad with the
            # static zp value so padded positions represent real 0, then
            # acc -= zp * row_sum(w). Bit-matches the (q - zp) integer conv
            # oracle, but the materialized pad + extra big-tensor op cost
            # ~2x e2e (uint8_e2e_ab_r4.json); kept for oracles and A/Bs.
            xv = x_q.values
            ph, pw = padding
            if ph or pw:
                xv = jax.lax.pad(
                    xv, jnp.asarray(zp, xv.dtype),
                    ((0, 0, 0), (ph, ph, 0), (pw, pw, 0), (0, 0, 0)))
            acc = conv2d_int32(
                xv, w_q.values, stride, (0, 0), dilation, groups)
            wsum = jnp.sum(w_q.values.astype(jnp.int32), axis=(0, 1, 2))
            acc = acc - zp * wsum
        else:
            # "bias": implicit zero padding (no pad copy — the r5 bisect
            # found the explicit zp-valued pad was the uint8 chain's main
            # in-graph cost) + the correction folded into a position-
            # dependent bias:
            #   sum_in (q_t - zp) w_t = acc_implicit - zp * Win(p)[k],
            # Win = conv(ones, w) = per-position sum of in-bounds taps
            # (interior rows equal row_sum(w); borders exact). zp is a
            # compile-time constant, Win a batch-independent N=1 conv —
            # the reference's alpha-folding ethos
            # (python/qtorch/cpp/conv2d.cuh:147-155) extended to borders.
            acc = conv2d_int32(
                x_q.values, w_q.values, stride, padding, dilation, groups)
        out = acc.astype(jnp.float32) * scale
        if zp is not None and zp_fold == "bias":
            # Win via a C=1 conv of per-tap channel-summed weights:
            # Win[p,k] = sum_{t in bounds at p} sum_c w[t,c,k]
            #          = conv(ones(1,H,W,1), sum_c w) — H*W*KH*KW*K MACs,
            # ~1/C the cost of the naive full-C ones-conv (r5 bisect: the
            # full-C version doubled every conv at b1)
            wtap = jnp.sum(w_q.values.astype(jnp.int32), axis=2,
                           keepdims=True)                  # (KH,KW,1,K)
            ones = jnp.ones((1, h, wdim, 1), jnp.int32)
            win = jax.lax.conv_general_dilated(
                ones, wtap, stride,
                ((padding[0], padding[0]), (padding[1], padding[1])),
                rhs_dilation=dilation, dimension_numbers=DIMSPEC,
                preferred_element_type=jnp.int32)          # (1,OH,OW,K)
            zp_corr = (-float(zp)) * win.astype(jnp.float32) * scale
            out = out + (zp_corr if bias is None
                         else zp_corr + jnp.asarray(bias, jnp.float32))
            bias = None
        if bias is not None:
            out = out + jnp.asarray(bias, jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        if requant:
            inv = 1.0 / jnp.asarray(out_scale, jnp.float32).reshape(-1)
            if out_unsigned:
                # shift folded inside the round: round(y) - 128 ==
                # round(y - 128) exactly (integer shift), keeping the
                # epilogue a single fused multiply-add + round + clip —
                # the same shape as the symmetric requant
                q = jnp.round(out * inv - 128.0)
                out = jnp.clip(q, -128.0, 127.0).astype(jnp.int8)
            else:
                q = jnp.round(out * inv)
                out = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
        else:
            out = out.astype(out_dtype)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    if requant:
        os_arr = jnp.asarray(out_scale, jnp.float32)
        if os_arr.size > 1:
            # per-out-channel requant scale (the per-group activation-scale
            # chain): the emitted QTensor carries a per-channel axis=3
            # scale, consumed downstream by the group-split path. XLA
            # backend only — the Pallas epilogues take scalar out scales.
            if backend not in ("xla", "xla_gemm"):
                raise NotImplementedError(
                    "vector out_scale requires the XLA backend")
            return QTensor(values=out,
                           scale=os_arr.reshape((1, 1, 1, out.shape[-1])),
                           bits=8, axis=3,
                           zero_point=-128 if out_unsigned else None)
        return QTensor(values=out, scale=os_arr,
                       bits=8, axis=None,
                       zero_point=-128 if out_unsigned else None)
    return out
