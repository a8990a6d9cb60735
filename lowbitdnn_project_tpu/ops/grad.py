"""Quantized training conv: custom VJP with int8 backward passes.

Reference parity: _QConv2d.backward (python/qtorch/nn/functional/qconv2d.py:73-116)
expresses both gradients as *convolutions of quantized tensors*:
  grad_input  = conv(quantize(grad_out), rot180(w)ᵀ)   (qconv2d.py:105-114;
                CUDA twin conv2DBackwardData3x3.cuh:61-64 rotated kernel,
                flipped padding kh-1-ph at :126-127)
  grad_weight = conv(xᵀ, grad_outᵀ) correlation        (qconv2d.py:91-103;
                CUDA twin conv2DBackwardWeights3x3.cuh:21-100)
The reference's tests show int8 gradients track float gradients closely
(tests/main.py:54-66). Here the same scheme rides jax.custom_vjp: forward is
the int8 conv with fused epilogue; backward re-quantizes the cotangent and
runs two int8 convs with int32 accumulation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.ops.conv import DIMSPEC, conv2d_int32
from lowbitdnn_project_tpu.quant.quantize import compute_scale


def _quant(x: jax.Array, axis=None):
    s = jax.lax.stop_gradient(compute_scale(x, axis=axis))
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def make_qconv2d_train(padding: int = 1, quantized_grads: bool = True):
    """Build a differentiable stride-1 quantized conv:
    fn(x_f32 NHWC, w_f32 HWIO) -> f32 NHWC.

    quantized_grads=True runs the reference's int8 backward scheme;
    False keeps the straight-through float backward (pure STE).
    """

    def fwd_value(x, w):
        xq, xs = _quant(x)
        wq, ws = _quant(w, axis=3)
        acc = conv2d_int32(xq, wq, (1, 1), (padding, padding))
        return acc.astype(jnp.float32) * (xs * ws.reshape(1, 1, 1, -1))

    @jax.custom_vjp
    def qconv(x, w):
        return fwd_value(x, w)

    def qconv_fwd(x, w):
        return fwd_value(x, w), (x, w)

    def qconv_bwd(res, g):
        x, w = res
        kh, kw, _, _ = w.shape
        if quantized_grads:
            # every backward operand is quantized first (qconv2d.py:81),
            # then both gradients run as ACTUAL int8 convolutions with int32
            # accumulation (the reference's cuDNN int8 backward,
            # qconv2d.py:91-114) and are scaled after. Weights are quantized
            # per-tensor here: grad_input contracts over K, so a per-K scale
            # cannot be factored out of the int32 conv.
            gq8, gs = _quant(g)
            xq, _xs = _quant(x)
            wq, ws = _quant(w)
            # grad_input: int8 conv of quantized grad with the 180°-rotated
            # quantized kernel, channels swapped, padding flipped to k-1-p
            gx = conv2d_int32(
                gq8, wq[::-1, ::-1].transpose(0, 1, 3, 2), (1, 1),
                (kh - 1 - padding, kw - 1 - padding),
            ).astype(jnp.float32) * (gs * ws)
            # grad_weight: correlation x ⋆ g as an int8 conv with batch
            # contracted (int32-exact; the float-conv formulation loses
            # bits past 2^24 when N*OH*OW accumulations get large).
            # int32 itself wraps past 2^31: the contraction length is
            # N*OH*OW and the worst-case per-product magnitude 127², so
            # batches are chunked to keep N_c*OH*OW within the provably
            # safe bound and the chunk sums accumulate in f32. (Within one
            # image, OH*OW beyond the bound keeps the reference's own
            # residual int32 assumption — cuDNN int8 backward had the
            # identical accumulator, qconv2d.py:91-114.)
            def gw_chunk(xc, gc):
                return conv2d_int32(
                    xc.transpose(3, 1, 2, 0), gc.transpose(1, 2, 0, 3),
                    (1, 1), (padding, padding)).astype(jnp.float32)

            nimg, oh, ow = x.shape[0], g.shape[1], g.shape[2]
            bound = (2 ** 31 - 1) // (127 * 127)
            if nimg * oh * ow <= bound:
                gw32 = gw_chunk(xq, gq8)
            else:
                nc = max(1, bound // (oh * ow))
                gw32 = sum(gw_chunk(xq[i:i + nc], gq8[i:i + nc])
                           for i in range(0, nimg, nc))
            gw = gw32.transpose(1, 2, 0, 3) * (_xs * gs)
        else:
            gx = jax.lax.conv_general_dilated(
                g, w[::-1, ::-1].transpose(0, 1, 3, 2), (1, 1),
                ((kh - 1 - padding, kh - 1 - padding),
                 (kw - 1 - padding, kw - 1 - padding)),
                dimension_numbers=DIMSPEC)
            xt = x.transpose(3, 1, 2, 0)
            gt = g.transpose(1, 2, 0, 3)
            gw = jax.lax.conv_general_dilated(
                xt, gt, (1, 1), ((padding, padding), (padding, padding)),
                dimension_numbers=DIMSPEC).transpose(1, 2, 0, 3)
        return gx, gw

    qconv.defvjp(qconv_fwd, qconv_bwd)
    return qconv
