"""FP32 checkpoint importers: torchvision state_dict -> NHWC/HWIO param pytrees.

The engine's converter entry point (BASELINE north star: "a quantizer that
emits per-channel int8/int4 weights + scales from FP32 checkpoints").
Layout translation: torch conv weights are OIHW -> transposed to HWIO;
linear weights (out, in) -> (in, out). No torch dependency at module import —
state_dicts are consumed as numpy mappings so .npz exports work too.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models.resnet import ResNetConfig, RESNET18


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_w(sd, name):
    return jnp.asarray(_np(sd[name]).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix):
    return dict(
        gamma=jnp.asarray(_np(sd[f"{prefix}.weight"])),
        beta=jnp.asarray(_np(sd[f"{prefix}.bias"])),
        mean=jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        var=jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    )


def resnet_from_torch_state_dict(
    sd: Mapping[str, Any], cfg: ResNetConfig = RESNET18
) -> Dict[str, Any]:
    """torchvision resnet{18,34,50} state_dict -> models/resnet.py param pytree.

    Feed the result to resnet.quantize_params for the INT8 graph.
    """
    params: Dict[str, Any] = {
        "conv1": _conv_w(sd, "conv1.weight"),
        "bn1": _bn(sd, "bn1"),
    }
    for s in range(4):
        stage = []
        b = 0
        while f"layer{s + 1}.{b}.conv1.weight" in sd:
            pre = f"layer{s + 1}.{b}"
            blk: Dict[str, Any] = {
                "conv1": _conv_w(sd, f"{pre}.conv1.weight"),
                "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _conv_w(sd, f"{pre}.conv2.weight"),
                "bn2": _bn(sd, f"{pre}.bn2"),
            }
            if cfg.bottleneck:
                blk["conv3"] = _conv_w(sd, f"{pre}.conv3.weight")
                blk["bn3"] = _bn(sd, f"{pre}.bn3")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv_w(sd, f"{pre}.downsample.0.weight"),
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            stage.append(blk)
            b += 1
        params[f"layer{s + 1}"] = stage
    params["fc"] = {
        "w": jnp.asarray(_np(sd["fc.weight"]).T),   # (out,in) -> (in,out)
        "b": jnp.asarray(_np(sd["fc.bias"])),
    }
    return params
