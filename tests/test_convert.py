"""models/convert.py: torchvision-shaped state_dict -> param pytree.

Builds a synthetic state_dict with torchvision resnet naming/layout (OIHW
convs, (out,in) linear) — no torchvision dependency — and checks tree
structure, layout transposition, and that the quantized graph runs on it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.models.convert import resnet_from_torch_state_dict

CFG = resnet.ResNetConfig(stage_blocks=(2, 2, 2, 2), bottleneck=False,
                          num_classes=10, width=8)


def _synthetic_state_dict(cfg, seed=0):
    """Torch-layout tensors with torchvision resnet names for ``cfg``."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, cin, cout, k):
        sd[name] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.1

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = (
            rng.normal(size=c).astype(np.float32) * 0.1)
        sd[f"{prefix}.running_var"] = (
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    conv("conv1.weight", cfg.in_channels, cfg.width, 7)
    bn("bn1", cfg.width)
    cin = cfg.width
    for s, nblocks in enumerate(cfg.stage_blocks):
        cmid = cfg.width * (2 ** s)
        cout = cmid * cfg.expansion
        for b in range(nblocks):
            stride = 2 if (s > 0 and b == 0) else 1
            pre = f"layer{s + 1}.{b}"
            if cfg.bottleneck:
                conv(f"{pre}.conv1.weight", cin, cmid, 1)
                bn(f"{pre}.bn1", cmid)
                conv(f"{pre}.conv2.weight", cmid, cmid, 3)
                bn(f"{pre}.bn2", cmid)
                conv(f"{pre}.conv3.weight", cmid, cout, 1)
                bn(f"{pre}.bn3", cout)
            else:
                conv(f"{pre}.conv1.weight", cin, cmid, 3)
                bn(f"{pre}.bn1", cmid)
                conv(f"{pre}.conv2.weight", cmid, cout, 3)
                bn(f"{pre}.bn2", cout)
            if stride != 1 or cin != cout:
                conv(f"{pre}.downsample.0.weight", cin, cout, 1)
                bn(f"{pre}.downsample.1", cout)
            cin = cout
    sd["fc.weight"] = rng.normal(size=(cfg.num_classes, cin)).astype(
        np.float32) * 0.1
    sd["fc.bias"] = rng.normal(size=cfg.num_classes).astype(np.float32) * 0.1
    return sd


def test_convert_tree_matches_init():
    """Converted tree has the same structure+shapes as init_params'."""
    sd = _synthetic_state_dict(CFG)
    got = resnet_from_torch_state_dict(sd, CFG)
    want = resnet.init_params(jax.random.key(0), CFG)
    gl, gt = jax.tree_util.tree_flatten(got)
    wl, wt = jax.tree_util.tree_flatten(want)
    assert gt == wt, f"treedef mismatch:\n{gt}\nvs\n{wt}"
    for g, w in zip(gl, wl):
        assert g.shape == w.shape, (g.shape, w.shape)


def test_convert_layout_transposition():
    """OIHW -> HWIO and (out,in) -> (in,out) value mapping is exact."""
    sd = _synthetic_state_dict(CFG, seed=1)
    params = resnet_from_torch_state_dict(sd, CFG)
    w_t = sd["conv1.weight"]                     # (O, I, H, W)
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]), w_t.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["fc"]["w"]), sd["fc.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["layer2"][0]["downsample"]["conv"]),
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["bn1"]["mean"]), sd["bn1.running_mean"])


def test_convert_torch_tensors_and_quantized_forward(rng):
    """Torch-tensor state_dict converts and the INT8 graph runs on it."""
    torch = __import__("torch")
    sd = {k: torch.from_numpy(v) for k, v in
          _synthetic_state_dict(CFG, seed=2).items()}
    params = resnet_from_torch_state_dict(sd, CFG)
    qparams = resnet.quantize_params(params, CFG)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    lf = resnet.apply_fp32(params, x, CFG)
    lq = resnet.apply_quantized(qparams, x, CFG, backend="xla")
    assert lq.shape == (2, 10)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.2, rel
