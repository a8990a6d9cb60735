"""ResNet-18/34/50/101/152 — FP32 baseline + INT8/INT4 quantized inference graphs.

Model family required by BASELINE.json configs 2/3/5. The reference has no
ResNet implementation (its only model is the 4-conv MNIST net, python/tmp.py:31-59);
it *analyzes* ResNet-34 weights for Winograd quantization ranges
(weights.py:8-26). Structure and parameter naming follow torchvision's
resnet so checkpoints can be imported via models/convert.py.

All tensors NHWC / HWIO (TPU-native; C,K on the 128-lane minor dim).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from lowbitdnn_project_tpu.models.layers import (
    QConvParams,
    QLinearParams,
    conv_block,
    fold_bn,
    linear_block,
    quantize_conv,
    quantize_linear,
)
from lowbitdnn_project_tpu.ops import max_pool2d, qmax_pool2d, avg_pool2d


@struct.dataclass
class ResNetConfig:
    stage_blocks: tuple = struct.field(pytree_node=False, default=(2, 2, 2, 2))
    bottleneck: bool = struct.field(pytree_node=False, default=False)
    num_classes: int = struct.field(pytree_node=False, default=1000)
    width: int = struct.field(pytree_node=False, default=64)
    in_channels: int = struct.field(pytree_node=False, default=3)

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1


RESNET18 = ResNetConfig(stage_blocks=(2, 2, 2, 2), bottleneck=False)
RESNET34 = ResNetConfig(stage_blocks=(3, 4, 6, 3), bottleneck=False)
RESNET50 = ResNetConfig(stage_blocks=(3, 4, 6, 3), bottleneck=True)
RESNET101 = ResNetConfig(stage_blocks=(3, 4, 23, 3), bottleneck=True)
RESNET152 = ResNetConfig(stage_blocks=(3, 8, 36, 3), bottleneck=True)


# ----------------------------------------------------------------- FP32 init

def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c, key=None):
    # Random-ish running stats so BN folding is a real transformation in
    # tests, not an identity.
    if key is None:
        return dict(gamma=jnp.ones((c,)), beta=jnp.zeros((c,)),
                    mean=jnp.zeros((c,)), var=jnp.ones((c,)))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        gamma=1.0 + 0.1 * jax.random.normal(k1, (c,)),
        beta=0.1 * jax.random.normal(k2, (c,)),
        mean=0.1 * jax.random.normal(k3, (c,)),
        var=jnp.exp(0.1 * jax.random.normal(k4, (c,))),
    )


def init_params(key: jax.Array, cfg: ResNetConfig = RESNET18,
                random_bn: bool = True) -> Dict[str, Any]:
    """Random FP32 parameter pytree (He init, torchvision-like structure)."""
    keys = iter(jax.random.split(key, 4096))

    def bn(c):
        return _bn_init(c, next(keys) if random_bn else None)

    params: Dict[str, Any] = {
        "conv1": _conv_init(next(keys), 7, 7, cfg.in_channels, cfg.width),
        "bn1": bn(cfg.width),
    }
    cin = cfg.width
    for s, nblocks in enumerate(cfg.stage_blocks):
        cmid = cfg.width * (2 ** s)
        cout = cmid * cfg.expansion
        stage: List[Dict[str, Any]] = []
        for b in range(nblocks):
            stride = 2 if (s > 0 and b == 0) else 1
            blk: Dict[str, Any] = {}
            if cfg.bottleneck:
                blk["conv1"] = _conv_init(next(keys), 1, 1, cin, cmid)
                blk["bn1"] = bn(cmid)
                blk["conv2"] = _conv_init(next(keys), 3, 3, cmid, cmid)
                blk["bn2"] = bn(cmid)
                blk["conv3"] = _conv_init(next(keys), 1, 1, cmid, cout)
                blk["bn3"] = bn(cout)
            else:
                blk["conv1"] = _conv_init(next(keys), 3, 3, cin, cmid)
                blk["bn1"] = bn(cmid)
                blk["conv2"] = _conv_init(next(keys), 3, 3, cmid, cout)
                blk["bn2"] = bn(cout)
            if stride != 1 or cin != cout:
                blk["downsample"] = {
                    "conv": _conv_init(next(keys), 1, 1, cin, cout),
                    "bn": bn(cout),
                }
            stage.append(blk)
            cin = cout
        params[f"layer{s + 1}"] = stage
    params["fc"] = {
        "w": _conv_init(next(keys), 1, 1, cin, cfg.num_classes)[0, 0],
        "b": jnp.zeros((cfg.num_classes,)),
    }
    return params


# ------------------------------------------------------------- FP32 forward

def _bn_apply(x, p, eps=1e-5):
    inv = p["gamma"] / jnp.sqrt(p["var"] + eps)
    return (x - p["mean"]) * inv + p["beta"]


def _conv_f32(x, w, stride=1, padding=0, relu=False):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(out, 0) if relu else out


def apply_fp32(params: Dict[str, Any], x: jax.Array,
               cfg: ResNetConfig = RESNET18) -> jax.Array:
    """FP32 inference forward (BN with running stats) — the accuracy baseline."""
    out = _conv_f32(x, params["conv1"], stride=2, padding=3)
    out = jnp.maximum(_bn_apply(out, params["bn1"]), 0)
    out = max_pool2d(out, 3, 2, 1)
    for s in range(4):
        for i, blk in enumerate(params[f"layer{s + 1}"]):
            stride = 2 if (s > 0 and i == 0) else 1
            identity = out
            if cfg.bottleneck:
                h = jnp.maximum(_bn_apply(_conv_f32(out, blk["conv1"]), blk["bn1"]), 0)
                h = jnp.maximum(_bn_apply(
                    _conv_f32(h, blk["conv2"], stride=stride, padding=1), blk["bn2"]), 0)
                h = _bn_apply(_conv_f32(h, blk["conv3"]), blk["bn3"])
            else:
                h = jnp.maximum(_bn_apply(
                    _conv_f32(out, blk["conv1"], stride=stride, padding=1), blk["bn1"]), 0)
                h = _bn_apply(_conv_f32(h, blk["conv2"], padding=1), blk["bn2"])
            if "downsample" in blk:
                identity = _bn_apply(
                    _conv_f32(out, blk["downsample"]["conv"], stride=stride),
                    blk["downsample"]["bn"])
            out = jnp.maximum(h + identity, 0)
    out = jnp.mean(out, axis=(1, 2))
    return out @ params["fc"]["w"] + params["fc"]["b"]


# ------------------------------------------------- fold + quantize -> INT8

def quantize_params(params: Dict[str, Any], cfg: ResNetConfig = RESNET18,
                    bits: int = 8,
                    weight_percentile: Optional[float] = None
                    ) -> Dict[str, Any]:
    """Fold BN into convs, then per-channel quantize every conv/linear.

    This is the engine's FP32-checkpoint -> quantized-graph converter
    (SURVEY.md §7 step 4; reference intent at QConv2d.py:24-32 commented
    state_dict hooks). weight_percentile clips each out-channel's weight
    range at the p-th percentile of |w| (outlier saturation) — the int4
    weight-range strategy A/B (accuracy_parity.json).
    """
    def qc(w, bn):
        wf, bf = fold_bn(w, None, bn["gamma"], bn["beta"], bn["mean"], bn["var"])
        return quantize_conv(wf, bf, bits=bits, percentile=weight_percentile)

    qp: Dict[str, Any] = {"conv1": qc(params["conv1"], params["bn1"])}
    for s in range(4):
        stage = []
        for blk in params[f"layer{s + 1}"]:
            qblk = {"conv1": qc(blk["conv1"], blk["bn1"]),
                    "conv2": qc(blk["conv2"], blk["bn2"])}
            if cfg.bottleneck:
                qblk["conv3"] = qc(blk["conv3"], blk["bn3"])
            if "downsample" in blk:
                qblk["downsample"] = qc(blk["downsample"]["conv"],
                                        blk["downsample"]["bn"])
            stage.append(qblk)
        qp[f"layer{s + 1}"] = stage
    qp["fc"] = quantize_linear(params["fc"]["w"], params["fc"]["b"])
    return qp


def fold_layer1_params(qparams: Dict[str, Any],
                       cfg: ResNetConfig = RESNET50) -> Dict[str, Any]:
    """Prepack layer1 into the folded-W layout for fold_layer1 routing.

    Applies kernels/resident_chain.py's fold_block_weights algebra to
    layer1's quantized blocks (per-out-channel scales and biases duplicate
    across the two W-parity halves) and returns qparams with a
    "layer1_folded" key.  Pure weight transformation — call once at
    prepare time, not inside the jitted forward.
    """
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        _blockdiag, fold_block_weights)
    from lowbitdnn_project_tpu.models.layers import QConvParams
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    if not cfg.bottleneck:
        return qparams

    def dup(v):
        return None if v is None else jnp.concatenate([v, v])

    def qt(vals4d, src: QTensor):
        sv = src.weight.scale_vector()
        return QTensor(values=vals4d,
                       scale=jnp.concatenate([sv, sv]).reshape(
                           1, 1, 1, -1),
                       bits=src.weight.bits, axis=3)

    folded = []
    for blk in qparams["layer1"]:
        w1q, w2q, w3q = blk["conv1"], blk["conv2"], blk["conv3"]
        cin, cmid = w1q.weight.shape[2:4]
        f = fold_block_weights(w1q.weight.values[0, 0], w2q.weight.values,
                               w3q.weight.values[0, 0])
        fb = {
            "conv1": QConvParams(weight=qt(f["w1"][None, None], w1q),
                                 bias=dup(w1q.bias)),
            "conv2": QConvParams(
                weight=qt(f["w2"].reshape(3, 3, 2 * cmid, 2 * cmid), w2q),
                bias=dup(w2q.bias)),
            "conv3": QConvParams(weight=qt(f["w3"][None, None], w3q),
                                 bias=dup(w3q.bias)),
        }
        if "downsample" in blk:
            dq = blk["downsample"]
            fb["downsample"] = QConvParams(
                weight=qt(_blockdiag(dq.weight.values[0, 0])[None, None],
                          dq),
                bias=dup(dq.bias))
        folded.append(fb)
    return dict(qparams, layer1_folded=folded)


# --------------------------------------------------------- quantized forward

def apply_quantized(
    qparams: Dict[str, Any],
    x: jax.Array,
    cfg: ResNetConfig = RESNET18,
    *,
    act_scales: Optional[Dict[str, jax.Array]] = None,
    act_dtype=jnp.float32,
    backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """INT8 inference forward: every conv/linear runs int8 on the MXU with
    fused dequant+bias+ReLU epilogues; residual adds in float.

    act_scales: optional calibrated static scales keyed by conv site
    ("conv1", "layer1.0.conv2", ..., "fc") — removes per-layer dynamic
    absmax passes. act_dtype: dtype of inter-layer activations (bf16 halves
    HBM traffic vs f32 with negligible accuracy impact: activations were
    just int8 anyway).
    """
    scales = act_scales or {}

    def cb(x, p, name, **kw):
        return conv_block(x, p, act_scale=scales.get(name),
                          out_dtype=act_dtype, backend=backend,
                          interpret=interpret, **kw)

    out = cb(x, qparams["conv1"], "conv1", stride=2, padding=3, relu=True)
    out = max_pool2d(out, 3, 2, 1)
    for s in range(4):
        blocks = qparams[f"layer{s + 1}"]
        for i, blk in enumerate(blocks):
            stride = 2 if (s > 0 and i == 0) else 1
            pre = f"layer{s + 1}.{i}"
            identity = out
            if cfg.bottleneck:
                h = cb(out, blk["conv1"], f"{pre}.conv1", relu=True)
                h = cb(h, blk["conv2"], f"{pre}.conv2", stride=stride,
                       padding=1, relu=True)
                h = cb(h, blk["conv3"], f"{pre}.conv3")
            else:
                h = cb(out, blk["conv1"], f"{pre}.conv1", stride=stride,
                       padding=1, relu=True)
                h = cb(h, blk["conv2"], f"{pre}.conv2", padding=1)
            if "downsample" in blk:
                identity = cb(out, blk["downsample"], f"{pre}.downsample",
                              stride=stride)
            out = jnp.maximum(h + identity, 0)
    out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
    return linear_block(out, qparams["fc"], act_scale=scales.get("fc"),
                        backend=backend, interpret=interpret)


def apply_quantized_int8chain(
    qparams: Dict[str, Any],
    x: jax.Array,
    act_scales: Dict[str, jax.Array],
    cfg: ResNetConfig = RESNET18,
    *,
    act_dtype=jnp.bfloat16,
    add_domain: str = "float",
    backend: str = "auto",
    stem_backend: str = "auto",
    block_backend: str = "none",
    use_w4a8_1x1: Optional[bool] = None,
    use_wpack: Optional[bool] = None,
    stage_packs: Optional[Dict[int, Dict[str, Any]]] = None,
    fold_layer1: bool = False,
    stop_after_stage: Optional[int] = None,
    start_at_stage: int = 0,
    skip_stem: bool = False,
    act_unsigned: bool = False,
    zp_fold: str = "acc",
    wino_mode: Optional[str] = None,
    act_groups: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fully int8-chained inference: activations stay int8 between convs.

    Every conv consumes an int8 QTensor and emits int8 requantized in the
    fused epilogue at the *consumer's* calibrated scale — the reference's
    pure-int8 "internal" pipeline (df-optimization/Int8Conv2d.py forward
    takes & returns scale), upgraded with static calibration. Only block
    boundaries (residual add + relu) run in float, then requantize.
    Residual adds: add_domain="float" (default, measured faster — XLA fuses
    the bf16 add+relu+requant chain into conv3's epilogue) keeps the skip
    connection in float; "int8" requantizes both operands to the consumer
    scale in the conv epilogues and sums in int16 with clip-as-relu
    (reference-style pure-int8 pipeline). Requires act_scales from
    calibrate_act_scales.
    stem_backend: "classic" (7x7 conv + reduce_window pool), "s2d8"
    (space-to-depth stem + Pallas phase pool, ops/stem.py), "fused"
    (single-pass Pallas conv+requant+maxpool, kernels/stem_fused.py —
    never materializes the 112x112 intermediate), or "auto" (fused for
    batch<=64 on the standard 224x224 stem, classic otherwise).
    e2e A/B, ResNet-50 int8 b128 regime (min over 3 interleaved passes):
    fused wins 2.05x/1.35x/1.13x over classic at b8/b32/b64, parity at
    b96, loses 5% at b128 — XLA's C=3 stem emitter is only weak when
    starved of rows.
    block_backend: "flat" fuses every stride-1 bottleneck residual block
    (C, Cmid both 128-multiples, float add domain) into ONE Pallas kernel
    in the flat pitched layout (kernels/block_flat.py) — conv1+conv2+conv3+
    add+relu+requant with intermediates never leaving VMEM; consecutive
    fused blocks chain without layout conversion. "resident" runs each
    stage's whole identity-block run as ONE Pallas dispatch with the
    activation map VMEM-resident across blocks
    (kernels/stage_resident.py) — the batch-1 serving formulation where
    the chain is per-op-overhead bound (serving_bisect_r3.json); requires
    ``stage_packs`` from pack_stage_resident. "none" runs every conv
    separately through ``backend``.
    stop_after_stage: 0..4 — return the int8 QTensor feature map after the
    stem (0) or after residual stage N instead of running the classifier
    head: backbone feature extraction for dense-prediction heads, and the
    in-chain stage-bisection hook for profiling.
    start_at_stage: 0..4 — enter the chain at residual stage N instead of
    the stem; x must then be the int8 QTensor feature map a
    stop_after_stage=N call would return (qparams only needs the keys the
    span touches). start=4 runs just the classifier head. Together with
    stop_after_stage this slices the chain into pipeline stages
    (apply_pipelined_int8chain).
    act_unsigned: asymmetric "uint8" activations at every post-ReLU requant
    site (the reference's uint8x4 activation configs,
    cpp/apps/config.json:55-80): post-ReLU data is one-sided, so 256 levels
    over [0, absmax] instead of wasting half the signed range. Calibrated
    scales are rescaled by 127/255 at those sites. Requires
    add_domain="float"; forces the classic stem and per-conv backend (the
    fused Pallas kernels are symmetric-int8-only).
    zp_fold: zero-point correction mode for act_unsigned convs (ops/conv.py
    qconv2d): "acc" (default) is the exact int32-domain subtraction —
    measured 0.94x of the symmetric chain at b32 (uint8_e2e_ab_r5.json)
    once the fused stem was allowed and the requant -128 shift folded
    into the round (those two were r4's "2x uint8 price", not this
    correction); "bias" is the structurally-symmetric position-bias fold,
    measured worse on speed AND accuracy (see qconv2d docstring).
    act_groups: per-GROUP activation scales through the whole chain (the
    reference's per-4-channel-group scheme at chain level): act_scales
    must come from calibrate_act_scales(channelwise=True) +
    group_act_scales(group_size=act_groups); every requant site emits a
    per-channel (group-constant) scale and every conv consumes it exactly
    via the group-split path (ops/conv.py act_group_size). Accuracy
    capability path — G partial convs per conv; A/B'd in
    accuracy_parity.json (int8_actgroups row). Requires
    add_domain="float", excludes act_unsigned/fused-stem/block backends.
    wino_mode: None | "int16" | "int8" — route every 3x3 stride-1 pad-1
    conv on an even HxW map through transform-domain quantized Winograd
    F(2x2,3x3) (ops/winograd.py qconv2d_winograd; the reference's fused
    Winograd kernel, conv2DForward3x3WinogradFused.cuh). "int16" keeps
    V/U exact in int16 (bit-level Winograd, no transform-domain quant
    error); "int8" requantizes the transform domain to int8 (the
    reference's per-position-scale scheme, its accuracy gated in
    accuracy_parity.json — BASELINE config 5's "where numerically safe").
    Incompatible with act_unsigned/block backends; eval/capability path.
    fold_layer1: run layer1 in the folded-W layout at the XLA level
    (requires fold_layer1_params prepack; bit-identical logits —
    tests/test_resident_chain.py). MEASURED NEGATIVE at batch: e2e
    0.857x/0.966x at b32/b128 (fold_l1_ab_r3.json) — the 2x padded MACs
    cost more than the cmid=64 lane-starvation they cure once the batch
    supplies rows. Opt-in; the same algebra is what wins at b1 inside the
    resident chain (kernels/resident_chain.py), where compute is free and
    dispatch dominates.
    use_wpack: route the layer1 bottleneck triples (where cin=cout=64
    leaves the MXU half-empty in BOTH the contraction and output lane
    dims) through the output-pair-packed formulation (ops/wpack.py).
    None = auto = OFF: the isolated triple wins 1.67x at b32
    (bench/probes/wpack_triple_probe.py) but the full-chain e2e A/B LOSES
    (b32: 2164 us wpack vs 1268 us classic, bench/probes/wpack_ab2.py) —
    in-chain, XLA fuses the classic blocks into neighborhoods the packed
    formulation breaks. Same probe-vs-e2e mis-ranking as the 1x1 Pallas
    routing (BENCH_NOTES round 2); kept as an explicit opt-in capability.
    """
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor
    from lowbitdnn_project_tpu.ops import qconv2d, qlinear, qmax_pool2d

    s = act_scales
    if use_w4a8_1x1 is None:
        # OFF by default: standalone per-layer probes showed batch-1 W4A8
        # kernel wins, but e2e A/B measured each in-chain Pallas insertion
        # costing ~30 us at batch 1 (17 routed layers: 796 vs 276 us) —
        # XLA fuses the whole int8 chain so well that standalone dispatch
        # comparisons mis-rank. Kept as an explicit opt-in capability.
        use_w4a8_1x1 = False
    if use_wpack is None:
        use_wpack = False  # e2e A/B loses at b32: see docstring
    if act_groups:
        if add_domain != "float" or act_unsigned:
            raise NotImplementedError(
                "act_groups needs add_domain='float' and symmetric "
                "activations")
        # fused/pallas paths are per-tensor-scale only
        stem_backend, block_backend = "classic", "none"
        use_wpack = use_w4a8_1x1 = False
        fold_layer1 = False
    if act_unsigned:
        if add_domain != "float":
            raise NotImplementedError("act_unsigned needs add_domain='float'")
        # symmetric-only fused block paths off; scales were calibrated as
        # absmax/127, asymmetric sites use absmax/255. The STEM keeps its
        # normal routing: the fused stem emits a symmetric int8 map (one
        # site of ~54 keeps the signed grid; the r4 A/B forced the classic
        # stem here, which was most of the measured b1 uint8 price — the
        # fused stem at b<=64 is ~120 us faster and orthogonal to the
        # epilogue asymmetry).
        block_backend = "none"
        use_wpack = use_w4a8_1x1 = False
        u = 127.0 / 255.0
    else:
        u = 1.0

    def qc(x_q, p, relu, out_scale=None, stride=1, padding=0,
           unsigned=False):
        if (wino_mode is not None and p.weight.shape[:2] == (3, 3)
                and stride == 1 and padding == 1 and not unsigned
                and x_q.zero_point is None and x_q.axis is None
                and x_q.shape[1] % 2 == 0 and x_q.shape[2] % 2 == 0):
            from lowbitdnn_project_tpu.ops.winograd import (
                qconv2d_winograd, wino_quantize_filter)
            u, us = wino_quantize_filter(p.weight, mode=wino_mode)
            return qconv2d_winograd(x_q, u, us, p.bias, relu=relu,
                                    out_scale=out_scale, out_dtype=act_dtype,
                                    mode=wino_mode)
        if (use_w4a8_1x1 and getattr(p, "w4pack", None) is not None
                and stride == 1 and padding == 0):
            from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
                w4a8_matmul_fused)
            n, h, wd, c = x_q.shape
            k = p.weight.shape[3]
            out = w4a8_matmul_fused(
                x_q.values.reshape(n * h * wd, c), p.w4pack,
                x_q.scale * p.weight.scale_vector(), p.bias,
                out_scale if out_scale is not None else None,
                relu=relu, requant=out_scale is not None,
                out_dtype=act_dtype, interpret=interpret)
            out = out.reshape(n, h, wd, k)
            if out_scale is not None:
                return QTensor(values=out,
                               scale=jnp.asarray(out_scale, jnp.float32))
            return out
        return qconv2d(x_q, p.weight, p.bias, stride=stride, padding=padding,
                       relu=relu, out_scale=out_scale, out_dtype=act_dtype,
                       backend=backend, out_unsigned=unsigned,
                       zp_fold=zp_fold,
                       act_group_size=act_groups or 32,
                       interpret=interpret)

    def rescale(x_q: QTensor, new_scale) -> QTensor:
        r = jnp.round(x_q.values.astype(jnp.float32) * (x_q.scale / new_scale))
        return QTensor(values=jnp.clip(r, -127, 127).astype(jnp.int8),
                       scale=new_scale)

    def next_site(st, i):
        nblocks = cfg.stage_blocks[st]
        if i + 1 < nblocks:
            return f"layer{st + 1}.{i + 1}.conv1"
        if st < 3:
            return f"layer{st + 2}.0.conv1"
        return "fc"

    # Pre-quantized int8 input (e.g. from runtime.preprocess_quantize) is
    # consumed directly — no float round-trip at the serving boundary.
    # skip_stem: enter at residual stage start_at_stage with the POST-STEM
    # feature map (the stop_after_stage=0 output) — the stem's half of the
    # pipeline-slicing hooks, used by the in-chain stem ablation
    # (bench/probes/stem_inchain.py)
    if start_at_stage > 0 or skip_stem:
        if not isinstance(x, QTensor):
            raise ValueError("start_at_stage > 0 / skip_stem takes the int8 "
                             "QTensor feature map of a stop_after_stage call")
        x_q = x
        use_fused = use_s2d = False
    else:
        x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
        w1 = qparams["conv1"].weight
        use_fused = stem_backend in ("fused", "fused2", "fused3") or (
            stem_backend == "auto" and x.shape[0] <= 64
            and x.shape[1:3] == (224, 224) and w1.shape == (7, 7, 3, 64))
        use_s2d = stem_backend == "s2d8"
    if start_at_stage > 0 or skip_stem:
        pass
    elif use_fused:
        from lowbitdnn_project_tpu.kernels.stem_fused import (
            stem_conv_pool_fused)
        # v3 (6-plane, K=216): beats v2 standalone 1.16x/1.05x/1.06x at
        # b8/32/64 and e2e (bench/probes/stem_v3_ab.py) — the default;
        # "fused2" pins the v2 generation
        x_q = stem_conv_pool_fused(x_q, w1, qparams["conv1"].bias,
                                   s["layer1.0.conv1"], relu=True,
                                   version=2 if stem_backend == "fused2"
                                   else 3,
                                   interpret=interpret)
    elif use_s2d:
        from lowbitdnn_project_tpu.ops.stem import stem_conv_pool_s2d
        x_q = stem_conv_pool_s2d(x_q, w1, qparams["conv1"].bias,
                                 s["layer1.0.conv1"], relu=True,
                                 interpret=interpret)
    else:
        x_q = qc(x_q, qparams["conv1"], relu=True,
                 out_scale=s["layer1.0.conv1"] * u, stride=2, padding=3,
                 unsigned=act_unsigned)
        x_q = qmax_pool2d(x_q, 3, 2, 1)
    def _fusable(blk, stride):
        if not (cfg.bottleneck and block_backend == "flat"
                and add_domain == "float" and stride == 1
                and "downsample" not in blk):
            return False
        _, _, c_in, cmid = blk["conv1"].weight.shape
        return c_in % 128 == 0 and cmid % 128 == 0

    def _flat_bm(c_in):
        # VMEM-sized block heights (acc3 is (bm, C) int32, weights resident)
        return {2048: 256, 1024: 512}.get(c_in, 1024)

    fmeta = None  # FlatMeta while x_q.values is resident in flat layout

    if stop_after_stage == 0:
        # feature-extraction exit (detection/segmentation backbones) —
        # also the in-chain stage-bisection hook for bench/harness
        return x_q

    use_resident = (block_backend == "resident" and stage_packs
                    and add_domain == "float" and not act_unsigned)
    use_fold_l1 = (fold_layer1 and "layer1_folded" in qparams
                   and add_domain == "float" and not act_unsigned
                   and cfg.bottleneck and start_at_stage == 0)

    for st in range(start_at_stage, 4):
        if st == 0 and use_fold_l1:
            # layer1 in the folded-W layout (kernels/resident_chain.py
            # fold_block_weights algebra, applied at the XLA level): the
            # 56x56x(64/256) stage is the measured lane-starvation ceiling
            # (cmid=64 half-fills the MXU lane dims — KERNEL_LAB layer1
            # closure); folding W-pairs into channels runs every conv at
            # full 128+ lanes for 2x padded MACs. Prepack via
            # fold_layer1_params; e2e A/B decides routing as always.
            n_, h_, w_, c_ = x_q.values.shape
            x_q = QTensor(values=x_q.values.reshape(n_, h_, w_ // 2, 2 * c_),
                          scale=x_q.scale)
            for i, fblk in enumerate(qparams["layer1_folded"]):
                pre = f"layer1.{i}"
                s_out = s[next_site(0, i)]
                h = qc(x_q, fblk["conv1"], relu=True,
                       out_scale=s[f"{pre}.conv2"])
                h = qc(h, fblk["conv2"], relu=True,
                       out_scale=s[f"{pre}.conv3"], padding=1)
                h = qc(h, fblk["conv3"], relu=False)
                if "downsample" in fblk:
                    identity = qc(x_q, fblk["downsample"], relu=False)
                else:
                    identity = x_q.dequantize().astype(act_dtype)
                out_f = jnp.maximum(h + identity, 0.0)
                x_q = quantize(out_f, scale=s_out)
            n_, h_, wf_, c2_ = x_q.values.shape
            x_q = QTensor(values=x_q.values.reshape(n_, h_, 2 * wf_,
                                                    c2_ // 2),
                          scale=x_q.scale)
            if stop_after_stage == 1:
                return x_q
            continue
        blocks = qparams[f"layer{st + 1}"]
        for i, blk in enumerate(blocks):
            if use_resident and st in stage_packs \
                    and i == stage_packs[st]["first"]:
                # whole identity-block run of this stage in ONE dispatch
                from lowbitdnn_project_tpu.kernels.stage_resident import (
                    run_stage_resident)
                x_q = run_stage_resident(x_q, stage_packs[st],
                                         interpret=interpret)
                break
            stride = 2 if (st > 0 and i == 0) else 1
            pre = f"layer{st + 1}.{i}"
            s_out = s[next_site(st, i)]
            last_scale = s_out if add_domain == "int8" else None
            if _fusable(blk, stride):
                from lowbitdnn_project_tpu.kernels.block_flat import (
                    bottleneck_flat_int8)
                from lowbitdnn_project_tpu.kernels.conv_flat import (
                    flat_meta, from_flat, to_flat)

                if fmeta is None:
                    fmeta = flat_meta(*x_q.values.shape[:3])
                    xf = to_flat(x_q.values, fmeta)
                else:
                    xf = x_q.values
                w1q, w2q, w3q = (blk["conv1"].weight, blk["conv2"].weight,
                                 blk["conv3"].weight)
                sc_y1, sc_y2 = s[f"{pre}.conv2"], s[f"{pre}.conv3"]
                xf = bottleneck_flat_int8(
                    xf, w1q.values[0, 0], w2q.values, w3q.values[0, 0],
                    jnp.stack([jnp.asarray(sc_y1, jnp.float32),
                               jnp.asarray(sc_y2, jnp.float32),
                               jnp.asarray(x_q.scale, jnp.float32),
                               jnp.asarray(s_out, jnp.float32)]),
                    x_q.scale * w1q.scale_vector(), blk["conv1"].bias,
                    sc_y1 * w2q.scale_vector(), blk["conv2"].bias,
                    sc_y2 * w3q.scale_vector(), blk["conv3"].bias,
                    meta=fmeta, bm=_flat_bm(w1q.shape[2]),
                    interpret=interpret)
                if i + 1 < len(blocks) and _fusable(blocks[i + 1], 1):
                    x_q = QTensor(values=xf, scale=s_out)  # stay flat
                else:
                    x_q = QTensor(values=from_flat(xf, fmeta), scale=s_out)
                    fmeta = None
                continue
            cmid = blk["conv2"].weight.shape[2] if cfg.bottleneck else 0
            if (cfg.bottleneck and use_wpack and stride == 1
                    and 2 * cmid <= 128 and x_q.shape[2] % 2 == 0):
                # layer1 bottlenecks: cmid=64 starves the MXU lane dims;
                # the packed triple wins 1.67x in isolation but loses
                # in-chain (see use_wpack docstring) — opt-in only.
                # Its residual tail always runs in the int8 add domain (the
                # float tail forces a tiled-memory relayout of the packed
                # f32 accumulation: measured +294 us/block) — so under
                # add_domain="float" the wpack blocks deviate from the
                # classic tail by one int8 rounding of the residual branch
                from lowbitdnn_project_tpu.ops.wpack import qbottleneck_wpack

                if "downsample" in blk:
                    identity = qc(x_q, blk["downsample"], relu=False,
                                  stride=stride, out_scale=s_out)
                else:
                    identity = x_q
                x_q = qbottleneck_wpack(
                    x_q, blk["conv1"], blk["conv2"], blk["conv3"],
                    s[f"{pre}.conv2"], s[f"{pre}.conv3"],
                    out_scale=s_out, out_dtype=act_dtype, identity=identity)
                continue
            if cfg.bottleneck:
                h = qc(x_q, blk["conv1"], relu=True,
                       out_scale=s[f"{pre}.conv2"] * u, unsigned=act_unsigned)
                h = qc(h, blk["conv2"], relu=True,
                       out_scale=s[f"{pre}.conv3"] * u, unsigned=act_unsigned,
                       stride=stride, padding=1)
                h = qc(h, blk["conv3"], relu=False, out_scale=last_scale)
            else:
                h = qc(x_q, blk["conv1"], relu=True, unsigned=act_unsigned,
                       out_scale=s[f"{pre}.conv2"] * u, stride=stride,
                       padding=1)
                h = qc(h, blk["conv2"], relu=False, padding=1,
                       out_scale=last_scale)
            if "downsample" in blk:
                identity = qc(x_q, blk["downsample"], relu=False,
                              stride=stride, out_scale=last_scale)
            elif add_domain == "int8":
                identity = rescale(x_q, s_out)
            else:
                identity = x_q.dequantize().astype(act_dtype)
            if add_domain == "int8":
                sum16 = (h.values.astype(jnp.int16)
                         + identity.values.astype(jnp.int16))
                x_q = QTensor(values=jnp.clip(sum16, 0, 127).astype(jnp.int8),
                              scale=s_out)
            else:
                out_f = jnp.maximum(h + identity, 0.0)
                x_q = quantize(out_f, scale=s_out * u,
                               unsigned=act_unsigned,
                               axis=3 if jnp.ndim(s_out) > 0 else None)
        if stop_after_stage == st + 1:
            return x_q
    # mean of dequantized values: subtracts the zero point when asymmetric
    feat = jnp.mean(x_q.dequantize(), axis=(1, 2))
    x_fc = quantize(feat, scale=s["fc"])
    return qlinear(x_fc, qparams["fc"].weight, qparams["fc"].bias,
                   backend=backend, interpret=interpret)


def apply_pipelined_int8chain(
    qparams: Dict[str, Any],
    x: jax.Array,
    act_scales: Dict[str, jax.Array],
    cfg: ResNetConfig,
    mesh,
    microbatches: Optional[int] = None,
    backend: str = "xla",
) -> jax.Array:
    """Pipeline-parallel int8 ResNet forward: the 4 residual stages become
    4 GPipe pipeline stages over ``mesh``'s stage axis (heterogeneous-stage
    pipeline, parallel/pipeline.py run_pipeline_het). Device r holds ONLY
    its stage's packed weights; the stem runs inside stage 0 and the
    classifier head runs after the pipeline on the gathered features.

    Numerics match apply_quantized_int8chain bit-exactly: the chain's
    per-example compute is batch-independent (static calibrated scales,
    elementwise float epilogues), so microbatching changes nothing.

    The reference is single-GPU (SURVEY.md §2) — this is the TPU-native
    distributed depth axis carrying a real model.
    """
    from lowbitdnn_project_tpu.parallel.pipeline import (
        PIPE_AXIS, run_pipeline_het)
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    n_stages = mesh.shape[PIPE_AXIS]
    if n_stages != 4:
        raise ValueError(f"ResNet pipeline needs a 4-stage mesh axis; "
                         f"got {n_stages}")
    s = act_scales
    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
    batch = x_q.shape[0]
    m = microbatches if microbatches is not None else min(batch, 8)
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")
    xs = x_q.values.reshape((m, batch // m) + x_q.shape[1:])

    def make_stage(r):
        in_scale = s["conv1"] if r == 0 else s[f"layer{r + 1}.0.conv1"]

        def fn(p, xv):
            xq = QTensor(values=xv, scale=jnp.asarray(in_scale, jnp.float32))
            out = apply_quantized_int8chain(
                p, xq, s, cfg, backend=backend, stem_backend="classic",
                start_at_stage=r, stop_after_stage=r + 1)
            return out.values

        return fn

    stage_params = [
        {"conv1": qparams["conv1"], "layer1": qparams["layer1"]},
        {"layer2": qparams["layer2"]},
        {"layer3": qparams["layer3"]},
        {"layer4": qparams["layer4"]},
    ]
    feats = run_pipeline_het([make_stage(r) for r in range(4)],
                             stage_params, xs, mesh)
    # features exit stage 4 quantized at the fc site scale (next_site)
    feat_q = QTensor(values=feats.reshape((batch,) + feats.shape[2:]),
                     scale=jnp.asarray(s["fc"], jnp.float32))
    return apply_quantized_int8chain({"fc": qparams["fc"]}, feat_q, s, cfg,
                                     backend=backend, start_at_stage=4)


def apply_spatial_int8chain(
    qparams: Dict[str, Any],
    x: jax.Array,
    act_scales: Dict[str, jax.Array],
    cfg: ResNetConfig,
    mesh,
    axis_name: Optional[str] = None,
    act_dtype=jnp.bfloat16,
) -> jax.Array:
    """Spatially-partitioned (H-sharded) int8 ResNet forward — SP's stated
    use case: batch-1 / big-image serving where one activation map
    dominates. The stem (7x7 s2 + maxpool) and every residual stage run
    H-sharded with ppermute halo exchange, INCLUDING the stride-2
    downsample boundaries (asymmetric halos, parallel/spatial.py). The SP
    region ends at a statically computed cut once the feature map is too
    small to shard (H not divisible / rows thinner than the halo); the
    remaining tail runs through apply_quantized_int8chain, with XLA's SPMD
    partitioner handling the re-shard at the boundary.

    Numerics: int32 accumulation is bit-identical to the unsharded chain;
    float epilogues may differ by 1 ULP per program (XLA FMA contraction),
    so outputs follow the repo's |delta| <= 1 requant oracle.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lowbitdnn_project_tpu.parallel.mesh import MODEL_AXIS
    from lowbitdnn_project_tpu.parallel.spatial import (
        qconv2d_sp, qmax_pool2d_sp, shard_spatial)
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    axis = axis_name or MODEL_AXIS
    sp = mesh.shape[axis]
    s = act_scales
    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
    n, h0, w0, _ = x_q.shape

    # ---- static SP-cut computation (pure shape arithmetic) ----
    def shardable(h, stride, top_halo):
        if h % sp:
            return False
        hl = h // sp
        return hl % stride == 0 and hl >= max(top_halo, 1)

    if not (shardable(h0, 2, 3) and shardable(h0 // 2, 2, 1)):
        raise ValueError(
            f"input H={h0} cannot be H-sharded {sp} ways through the stem; "
            f"use the plain chain")
    cut, h_in = 0, h0 // 4                       # stem + pool done
    for st in range(4):
        stride = 2 if st > 0 else 1
        if not shardable(h_in, stride, 1):
            break
        cut, h_in = st + 1, h_in // stride
    if cut == 0:
        # start_at_stage=0 would re-run the stem; an SP region that cannot
        # even cover layer1 is pointless anyway
        raise ValueError(
            f"H={h0 // 4} after the stem cannot be sharded {sp} ways "
            f"through layer1; use the plain chain")

    def next_site(st, i):
        if i + 1 < cfg.stage_blocks[st]:
            return f"layer{st + 1}.{i + 1}.conv1"
        if st < 3:
            return f"layer{st + 2}.0.conv1"
        return "fc"

    def body(xv, qp):
        def cb(xvals, in_scale, p, relu, out_scale=None, stride=1,
               pad_w=None):
            comb = (jnp.asarray(in_scale, jnp.float32)
                    * p.weight.scale_vector()).reshape(-1)
            return qconv2d_sp(xvals, p.weight.values, comb, p.bias,
                              stride=stride, pad_w=pad_w, relu=relu,
                              out_scale=out_scale, axis_name=axis)

        hq = cb(xv, s["conv1"], qp["conv1"], relu=True,
                out_scale=s["layer1.0.conv1"], stride=2, pad_w=3)
        hq = qmax_pool2d_sp(hq, 3, 2, 1, axis_name=axis)
        cur_scale = s["layer1.0.conv1"]
        for st in range(cut):
            for i, blk in enumerate(qp[f"layer{st + 1}"]):
                stride = 2 if (st > 0 and i == 0) else 1
                pre = f"layer{st + 1}.{i}"
                s_out = s[next_site(st, i)]
                if cfg.bottleneck:
                    b1 = cb(hq, cur_scale, blk["conv1"], relu=True,
                            out_scale=s[f"{pre}.conv2"])
                    b2 = cb(b1, s[f"{pre}.conv2"], blk["conv2"], relu=True,
                            out_scale=s[f"{pre}.conv3"], stride=stride)
                    hf = cb(b2, s[f"{pre}.conv3"], blk["conv3"], relu=False)
                else:
                    b1 = cb(hq, cur_scale, blk["conv1"], relu=True,
                            out_scale=s[f"{pre}.conv2"], stride=stride)
                    hf = cb(b1, s[f"{pre}.conv2"], blk["conv2"], relu=False)
                if "downsample" in blk:
                    idf = cb(hq, cur_scale, blk["downsample"], relu=False,
                             stride=stride, pad_w=0)
                else:
                    idf = hq.astype(jnp.float32) * jnp.asarray(
                        cur_scale, jnp.float32)
                # match the plain chain's numerics exactly: bf16 add domain
                # (qconv2d out_dtype=act_dtype) and f32 division at requant
                # (quant.quantize) — same |delta|<=1 oracle as the chain
                out_f = jnp.maximum(hf.astype(act_dtype)
                                    + idf.astype(act_dtype), 0.0)
                q = jnp.round(out_f.astype(jnp.float32)
                              / jnp.asarray(s_out, jnp.float32))
                hq = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
                cur_scale = s_out
        return hq

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(None, axis, None, None), P()),
                   out_specs=P(None, axis, None, None))
    feats = fn(shard_spatial(x_q.values, mesh, axis), qparams)
    if cut < 4:
        # gather the (tiny) post-cut feature map: the tail's strided int8
        # convs on an H-sharded operand trip an XLA SPMD partitioner bug
        # (mis-typed pad-value broadcast), and at H<=8 rows the gather is
        # noise anyway
        feats = jax.device_put(feats, NamedSharding(mesh, P()))
    cut_scale = s["fc"] if cut == 4 else s[f"layer{cut + 1}.0.conv1"]
    x_tail = QTensor(values=feats, scale=jnp.asarray(cut_scale, jnp.float32))
    return apply_quantized_int8chain(qparams, x_tail, s, cfg, backend="xla",
                                     start_at_stage=cut)


def calibrate_act_scales(
    params: Dict[str, Any],
    batches,
    cfg: ResNetConfig = RESNET18,
    bits: int = 8,
    strategy: str = "absmax",
    sigma_k: float = 4.0,
    percentile: float = 99.99,
    channelwise: bool = False,
) -> Dict[str, jax.Array]:
    """Static activation calibration: run FP32 forwards over calibration
    batches, record per-site statistics, return site -> scale. (Reference
    quantizes dynamically per batch, qconv2d.py:52-56; static calibration
    is the production upgrade.)

    strategy selects the range rule (quant/calibrate.py Calibrator twins,
    accuracy-A/B'd in examples/accuracy_parity.py):
      * "absmax"     — max |x| over all batches (the reference's rule)
      * "sigma"      — |mean| + k*std, clipped to absmax (the reference's
                       ±4σ methodology, weights.py:8-26)
      * "percentile" — p-th percentile of |x| per batch, max over batches
                       (a conservative streaming estimator: never below
                       any single batch's percentile)
    """
    from lowbitdnn_project_tpu.quant.qtensor import QMAX

    if channelwise and strategy != "absmax":
        raise NotImplementedError("channelwise calibration: absmax only")

    @jax.jit
    def site_stats(params, x):
        caps: Dict[str, jax.Array] = {}

        def track(name, v):
            # channelwise: per-channel absmax for 4D (NHWC) sites — the
            # raw material for per-group activation scales
            # (group_act_scales); scalar sites (fc) stay per-tensor
            if channelwise and v.ndim == 4:
                stats = {"absmax": jnp.max(jnp.abs(v), axis=(0, 1, 2))}
            else:
                stats = {"absmax": jnp.max(jnp.abs(v))}
            if strategy == "sigma":
                vf = v.astype(jnp.float32)
                stats.update(n=jnp.float32(vf.size), s=jnp.sum(vf),
                             ss=jnp.sum(vf * vf))
            elif strategy == "percentile":
                stats["pct"] = jnp.percentile(
                    jnp.abs(v.astype(jnp.float32)).ravel(), percentile)
            caps[name] = stats
            return v

        out = _conv_f32(track("conv1", x), params["conv1"], stride=2, padding=3)
        out = jnp.maximum(_bn_apply(out, params["bn1"]), 0)
        out = max_pool2d(out, 3, 2, 1)
        for s in range(4):
            for i, blk in enumerate(params[f"layer{s + 1}"]):
                stride = 2 if (s > 0 and i == 0) else 1
                pre = f"layer{s + 1}.{i}"
                identity = out
                if cfg.bottleneck:
                    h = jnp.maximum(_bn_apply(_conv_f32(
                        track(f"{pre}.conv1", out), blk["conv1"]), blk["bn1"]), 0)
                    h = jnp.maximum(_bn_apply(_conv_f32(
                        track(f"{pre}.conv2", h), blk["conv2"], stride=stride,
                        padding=1), blk["bn2"]), 0)
                    h = _bn_apply(_conv_f32(
                        track(f"{pre}.conv3", h), blk["conv3"]), blk["bn3"])
                else:
                    h = jnp.maximum(_bn_apply(_conv_f32(
                        track(f"{pre}.conv1", out), blk["conv1"], stride=stride,
                        padding=1), blk["bn1"]), 0)
                    h = _bn_apply(_conv_f32(
                        track(f"{pre}.conv2", h), blk["conv2"], padding=1),
                        blk["bn2"])
                if "downsample" in blk:
                    track(f"{pre}.downsample", out)
                    identity = _bn_apply(
                        _conv_f32(out, blk["downsample"]["conv"], stride=stride),
                        blk["downsample"]["bn"])
                out = jnp.maximum(h + identity, 0)
        out = jnp.mean(out, axis=(1, 2))
        track("fc", out)
        return caps

    acc: Dict[str, Dict[str, jax.Array]] = {}
    for x in batches:
        caps = site_stats(params, x)
        for k, st in caps.items():
            if k not in acc:
                acc[k] = dict(st)
                continue
            a = acc[k]
            a["absmax"] = jnp.maximum(a["absmax"], st["absmax"])
            if strategy == "sigma":
                for f in ("n", "s", "ss"):
                    a[f] = a[f] + st[f]
            elif strategy == "percentile":
                a["pct"] = jnp.maximum(a["pct"], st["pct"])

    def range_max(a):
        if strategy == "absmax":
            return a["absmax"]
        if strategy == "sigma":
            mean = a["s"] / a["n"]
            var = jnp.maximum(a["ss"] / a["n"] - mean * mean, 0.0)
            return jnp.minimum(jnp.abs(mean) + sigma_k * jnp.sqrt(var),
                               a["absmax"])
        return a["pct"]

    qmax = QMAX[bits]
    return {k: jnp.maximum(range_max(a), 1e-12) / qmax
            for k, a in acc.items()}


def group_act_scales(scales: Dict[str, jax.Array], group_size: int = 32
                     ) -> Dict[str, jax.Array]:
    """Per-channel calibrated scales -> group-constant per-channel scales.

    Input: calibrate_act_scales(..., channelwise=True) output (per-channel
    absmax vectors at 4D sites). Each site's channels are grouped in runs
    of ``group_size`` and each group gets its own scale (the max over the
    group), expanded back to per-channel — the contract qconv2d's
    group-split path consumes exactly (reference per-4-channel-group
    scheme, conv2DForward3x3Fused.cuh:15-31). Sites whose channel count
    group_size does not divide (the C=3 input site) and scalar sites fall
    back to per-tensor.
    """
    out = {}
    for k, v in scales.items():
        v = jnp.asarray(v)
        if v.ndim == 0 or v.size == 1:
            out[k] = v.reshape(())
            continue
        c = v.shape[0]
        if c % group_size:
            out[k] = jnp.max(v).reshape(())
            continue
        g = v.reshape(c // group_size, group_size)
        gm = jnp.max(g, axis=1, keepdims=True)
        out[k] = jnp.broadcast_to(gm, g.shape).reshape(c)
    return out
