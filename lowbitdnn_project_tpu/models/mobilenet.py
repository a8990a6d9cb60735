"""MobileNet-V2 — INT8 depthwise+pointwise convs (BASELINE.json config 4).

No reference counterpart; required by the driver baseline. Depthwise convs
are bandwidth-bound VPU work on TPU (no MXU), pointwise 1x1 convs are pure
int8 GEMMs — the two extremes of the engine's kernel strategy.

Inverted residual: 1x1 expand (relu6) -> 3x3 depthwise (relu6) -> 1x1
project (linear), residual when stride 1 and cin == cout.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from lowbitdnn_project_tpu.models.layers import (
    fold_bn,
    quantize_conv,
    quantize_linear,
    QConvParams,
)
from lowbitdnn_project_tpu.quant import quantize
from lowbitdnn_project_tpu.ops import qconv2d, qlinear


@struct.dataclass
class MobileNetV2Config:
    # (expansion t, out channels c, repeats n, stride s) per stage
    stages: tuple = struct.field(pytree_node=False, default=(
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)))
    num_classes: int = struct.field(pytree_node=False, default=1000)
    in_channels: int = struct.field(pytree_node=False, default=3)
    stem_ch: int = struct.field(pytree_node=False, default=32)
    head_ch: int = struct.field(pytree_node=False, default=1280)


MOBILENET_V2 = MobileNetV2Config()


def _conv_init(key, kh, kw, cin, cout):
    std = (2.0 / (kh * kw * cin)) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        gamma=1.0 + 0.1 * jax.random.normal(k1, (c,)),
        beta=0.1 * jax.random.normal(k2, (c,)),
        mean=0.1 * jax.random.normal(k3, (c,)),
        var=jnp.exp(0.1 * jax.random.normal(k4, (c,))),
    )


def init_params(key: jax.Array, cfg: MobileNetV2Config = MOBILENET_V2
                ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4096))
    params: Dict[str, Any] = {
        "stem": {"w": _conv_init(next(keys), 3, 3, cfg.in_channels, cfg.stem_ch),
                 "bn": _bn_init(cfg.stem_ch, next(keys))},
    }
    cin = cfg.stem_ch
    blocks: List[Dict[str, Any]] = []
    for t, c, n, s in cfg.stages:
        for i in range(n):
            cmid = cin * t
            # no 'stride' key in the pytree: strides are static config
            # (block_strides) — a python-int leaf would be traced by jit and
            # come back as an int32 array after one QAT step
            blk: Dict[str, Any] = {}
            if t != 1:
                blk["expand"] = {"w": _conv_init(next(keys), 1, 1, cin, cmid),
                                 "bn": _bn_init(cmid, next(keys))}
            # depthwise weight: (3, 3, 1, cmid) HWIO with groups=cmid
            blk["dw"] = {"w": _conv_init(next(keys), 3, 3, 1, cmid) * (cmid ** 0.5),
                         "bn": _bn_init(cmid, next(keys))}
            blk["project"] = {"w": _conv_init(next(keys), 1, 1, cmid, c),
                              "bn": _bn_init(c, next(keys))}
            blocks.append(blk)
            cin = c
    params["blocks"] = blocks
    params["head"] = {"w": _conv_init(next(keys), 1, 1, cin, cfg.head_ch),
                      "bn": _bn_init(cfg.head_ch, next(keys))}
    params["fc"] = {"w": _conv_init(next(keys), 1, 1, cfg.head_ch,
                                    cfg.num_classes)[0, 0],
                    "b": jnp.zeros((cfg.num_classes,))}
    return params


def block_strides(cfg: MobileNetV2Config):
    """Static per-block strides derived from cfg.stages (jit-safe: never
    read stride out of a traced param pytree)."""
    out = []
    for t, c, n, s in cfg.stages:
        out += [s] + [1] * (n - 1)
    return out


def _bn_apply(x, p, eps=1e-5):
    return (x - p["mean"]) * (p["gamma"] / jnp.sqrt(p["var"] + eps)) + p["beta"]


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _conv_f32(x, w, stride=1, padding=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups)


def apply_fp32(params, x, cfg: MobileNetV2Config = MOBILENET_V2,
               stop_after_block: Optional[int] = None):
    strides = block_strides(cfg)
    out = _relu6(_bn_apply(_conv_f32(x, params["stem"]["w"], 2, 1),
                           params["stem"]["bn"]))
    if stop_after_block == -1:
        return out
    for i, blk in enumerate(params["blocks"]):
        identity = out
        h = out
        if "expand" in blk:
            h = _relu6(_bn_apply(_conv_f32(h, blk["expand"]["w"]),
                                 blk["expand"]["bn"]))
        cmid = h.shape[-1]
        h = _relu6(_bn_apply(
            _conv_f32(h, blk["dw"]["w"], strides[i], 1, groups=cmid),
            blk["dw"]["bn"]))
        h = _bn_apply(_conv_f32(h, blk["project"]["w"]), blk["project"]["bn"])
        if strides[i] == 1 and identity.shape == h.shape:
            h = h + identity
        out = h
        if stop_after_block == i:
            return out
    out = _relu6(_bn_apply(_conv_f32(out, params["head"]["w"]), params["head"]["bn"]))
    out = jnp.mean(out, axis=(1, 2))
    return out @ params["fc"]["w"] + params["fc"]["b"]


def quantize_params(params, cfg: MobileNetV2Config = MOBILENET_V2,
                    bits: int = 8, dw_bits: Optional[int] = None):
    """Fold BN and quantize. dw_bits pins the DEPTHWISE weights' bit-width
    separately (default: 8 when bits < 8). Rationale: dw kernels hold <2%
    of MobileNet's weights but each output channel depends on just 9 of
    them — int4 there costs whole accuracy points (measured 8.8% top-1 in
    examples/accuracy_parity.py) for ~zero storage win, so the W4A8 config
    keeps dw at int8 like production W4 deployments do."""
    if dw_bits is None:
        dw_bits = 8 if bits < 8 else bits

    def qc(d, b=bits):
        wf, bf = fold_bn(d["w"], None, d["bn"]["gamma"], d["bn"]["beta"],
                         d["bn"]["mean"], d["bn"]["var"])
        return quantize_conv(wf, bf, bits=b)

    qp: Dict[str, Any] = {"stem": qc(params["stem"])}
    qblocks = []
    for blk in params["blocks"]:
        # NB: no 'stride' key — strides are static config (block_strides);
        # storing them in the pytree reintroduces the traced-stride hazard
        qblk = {"dw": qc(blk["dw"], dw_bits), "project": qc(blk["project"])}
        if "expand" in blk:
            qblk["expand"] = qc(blk["expand"])
        qblocks.append(qblk)
    qp["blocks"] = qblocks
    qp["head"] = qc(params["head"])
    qp["fc"] = quantize_linear(params["fc"]["w"], params["fc"]["b"])
    return qp


def _qconv_relu6(x, p: QConvParams, stride=1, padding=0, groups=1,
                 relu6=True, backend="auto", interpret=False):
    # relu6's upper clip happens in float after the fused epilogue's relu;
    # the lower clip rides the in-kernel relu.
    x_q = quantize(x)
    out = qconv2d(x_q, p.weight, p.bias, stride=stride, padding=padding,
                  groups=groups, relu=relu6, backend=backend,
                  interpret=interpret)
    return jnp.minimum(out, 6.0) if relu6 else out


def calibrate_act_scales(params, batches, cfg: MobileNetV2Config = MOBILENET_V2,
                         qmax: int = 127):
    """Static activation calibration at every conv input site (absmax),
    mirroring resnet.calibrate_act_scales."""
    import jax as _jax

    # strides must be static (conv window_strides): derive from cfg, never
    # from the param pytree (whose leaves may be traced or device arrays)
    strides = block_strides(cfg)

    @_jax.jit
    def site_absmax(params, x):
        caps = {}

        def track(name, v):
            caps[name] = jnp.max(jnp.abs(v))
            return v

        out = _relu6(_bn_apply(_conv_f32(track("stem", x), params["stem"]["w"],
                                         2, 1), params["stem"]["bn"]))
        for i, blk in enumerate(params["blocks"]):
            identity = out
            h = out
            if "expand" in blk:
                h = _relu6(_bn_apply(_conv_f32(track(f"b{i}.expand", h),
                                               blk["expand"]["w"]),
                                     blk["expand"]["bn"]))
            cmid = h.shape[-1]
            h = _relu6(_bn_apply(
                _conv_f32(track(f"b{i}.dw", h), blk["dw"]["w"], strides[i],
                          1, groups=cmid), blk["dw"]["bn"]))
            h = _bn_apply(_conv_f32(track(f"b{i}.project", h),
                                    blk["project"]["w"]), blk["project"]["bn"])
            if strides[i] == 1 and identity.shape == h.shape:
                h = h + identity
            out = h
        out = _relu6(_bn_apply(_conv_f32(track("head", out), params["head"]["w"]),
                               params["head"]["bn"]))
        out = jnp.mean(out, axis=(1, 2))
        track("fc", out)
        return caps

    maxima = {}
    for x in batches:
        caps = site_absmax(params, x)
        for k, v in caps.items():
            maxima[k] = jnp.maximum(maxima[k], v) if k in maxima else v
    return {k: jnp.maximum(v, 1e-12) / qmax for k, v in maxima.items()}


def apply_quantized_int8chain(qparams, x, act_scales,
                              cfg: MobileNetV2Config = MOBILENET_V2, *,
                              act_dtype=jnp.bfloat16, add_domain="float",
                              dw_domain: str = "int8",
                              stem_domain: str = "auto",
                              backend: str = "auto",
                              act_unsigned: bool = False,
                              stop_after_block: Optional[int] = None,
                              interpret: bool = False):
    """Fully int8-chained MobileNet-V2: expand/dw/project consume and emit
    int8 at the consumer's calibrated scale. Residual adds default to the
    float domain (XLA fuses the add+requant chain into project's epilogue —
    measured faster, same finding as resnet); add_domain="int8" keeps the
    reference-style int16 sum with clip to [-127,127] (no relu - project is
    linear). relu6's upper clamp is subsumed by the requant clip:
    calibrated post-relu6 scales satisfy 6/s >= 127.

    dw_domain="float" runs the depthwise convs in act_dtype (bf16) with the
    pointwise convs still int8 on the MXU — measured LOSER (0.88x vs int8's
    0.94x at b128, mobilenet_ab_r3.json): requant epilogues are free
    in-chain; kept as the documented negative result.

    stem_domain: "auto"/"float" runs the C=3 3x3/s2 stem in act_dtype with
    the quantize fused into its epilogue; "int8" quantizes the input first.
    The b128 bisect (mobilenet_bisect_r3.json) found the int8 stem is THE
    MobileNet int8-vs-bf16 deficit: 297 vs 132 us (C=3 lane starvation —
    int8 buys nothing at 3 input channels, same arithmetic as the ResNet
    stem), while the residual blocks in aggregate favor int8."""
    from lowbitdnn_project_tpu.quant import QTensor, quantize

    s = act_scales
    nblocks = len(qparams["blocks"])
    u = 127.0 / 255.0 if act_unsigned else 1.0

    def qc(x_q, p, out_scale, relu, stride=1, padding=0, groups=1,
           unsigned=False):
        return qconv2d(x_q, p.weight, p.bias, stride=stride, padding=padding,
                       groups=groups, relu=relu, out_scale=out_scale,
                       out_dtype=act_dtype, backend=backend,
                       out_unsigned=unsigned,
                       interpret=interpret)

    def rescale(x_q, new_scale):
        r = jnp.round(x_q.values.astype(jnp.float32) * (x_q.scale / new_scale))
        return QTensor(values=jnp.clip(r, -127, 127).astype(jnp.int8),
                       scale=new_scale)

    def block_in_site(i):
        if i < nblocks:
            blk = qparams["blocks"][i]
            return f"b{i}.expand" if "expand" in blk else f"b{i}.dw"
        return "head"

    def dw_float(h, blk, stride, cmid):
        """Depthwise in act_dtype: dequantized per-channel weight, float
        conv (VPU work either way), relu, quantize back at the project
        scale — the int8 dw's requant epilogue disappears into this
        quantize and the conv itself sees no MXU loss (it never had MXU)."""
        if isinstance(h, QTensor):
            h = h.dequantize().astype(act_dtype)
        wf = blk["dw"].weight.dequantize().astype(act_dtype)
        h = _conv_f32(h, wf, stride, 1, groups=cmid)
        if blk["dw"].bias is not None:
            h = h + blk["dw"].bias.astype(act_dtype)
        # relu6's upper clamp is subsumed by the quantize clip exactly as in
        # the int8 path (calibrated 6/s >= 127)
        return jnp.maximum(h, jnp.asarray(0, act_dtype))

    strides = block_strides(cfg)
    if stem_domain in ("auto", "float"):
        # float stem: C=3 starves the int8 lane dim (bisect: 297 vs 132 us
        # at b128); conv in act_dtype straight from the float input, with
        # the b0 quantize fused into the epilogue. No input quantize at all.
        wf = qparams["stem"].weight.dequantize().astype(act_dtype)
        h = _conv_f32(x.astype(act_dtype), wf, 2, 1)
        if qparams["stem"].bias is not None:
            h = h + qparams["stem"].bias.astype(act_dtype)
        h = jnp.maximum(h, jnp.asarray(0, act_dtype))   # 6-clamp ≡ requant clip
        x_q = quantize(h.astype(jnp.float32), scale=s[block_in_site(0)] * u,
                       unsigned=act_unsigned)
    else:
        x_q = quantize(x, scale=s["stem"])
        x_q = qc(x_q, qparams["stem"], s[block_in_site(0)] * u, relu=True,
                 stride=2, padding=1, unsigned=act_unsigned)
    if stop_after_block == -1:
        return x_q.values
    for i, blk in enumerate(qparams["blocks"]):
        s_out = s[block_in_site(i + 1)]
        h = x_q
        if "expand" in blk:
            h = qc(h, blk["expand"], s[f"b{i}.dw"] * u, relu=True,
                   unsigned=act_unsigned)
        cmid = h.shape[-1]
        if dw_domain == "float":
            h = quantize(dw_float(h, blk, strides[i], cmid),
                         scale=s[f"b{i}.project"] * u,
                         unsigned=act_unsigned)
        else:
            h = qc(h, blk["dw"], s[f"b{i}.project"] * u, relu=True,
                   stride=strides[i], padding=1, groups=cmid,
                   unsigned=act_unsigned)
        residual = (strides[i] == 1 and
                    x_q.shape[-1] == blk["project"].weight.shape[-1])
        if residual and add_domain == "float":
            h_f = qc(h, blk["project"], None, relu=False)   # float out
            out_f = h_f + x_q.dequantize().astype(act_dtype)
            x_q = quantize(out_f, scale=s_out)
        else:
            h = qc(h, blk["project"], s_out, relu=False)
            if residual:
                identity = rescale(x_q, s_out)
                sum16 = (h.values.astype(jnp.int16)
                         + identity.values.astype(jnp.int16))
                h = QTensor(values=jnp.clip(sum16, -127, 127).astype(jnp.int8),
                            scale=s_out)
            x_q = h
        if stop_after_block == i:
            return x_q.values
    x_q = qc(x_q, qparams["head"], None, relu=True)
    # head emits float (relu6 upper clamp applied here), then pool + fc
    feat = jnp.mean(jnp.minimum(x_q, 6.0).astype(jnp.float32), axis=(1, 2))
    f_q = quantize(feat, scale=s["fc"])
    return qlinear(f_q, qparams["fc"].weight, qparams["fc"].bias,
                   backend=backend, interpret=interpret)


def apply_quantized(qparams, x, cfg: MobileNetV2Config = MOBILENET_V2, *,
                    backend: str = "auto", interpret: bool = False):
    strides = block_strides(cfg)
    qc = functools.partial(_qconv_relu6, backend=backend, interpret=interpret)
    out = qc(x, qparams["stem"], stride=2, padding=1)
    for i, blk in enumerate(qparams["blocks"]):
        identity = out
        h = out
        if "expand" in blk:
            h = qc(h, blk["expand"])
        cmid = h.shape[-1]
        # depthwise: XLA/VPU path (groups == channels, no MXU work)
        h = qc(h, blk["dw"], stride=strides[i], padding=1, groups=cmid,
               backend="xla")
        h = qc(h, blk["project"], relu6=False)
        if strides[i] == 1 and identity.shape == h.shape:
            h = h + identity
        out = h
    out = qc(out, qparams["head"])
    out = jnp.mean(out, axis=(1, 2))
    x_q = quantize(out)
    return qlinear(x_q, qparams["fc"].weight, qparams["fc"].bias,
                   backend=backend, interpret=interpret)
