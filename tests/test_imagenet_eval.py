"""examples/imagenet_eval.py plumbing: the directory-driven eval loop is
exercised in CI on a tiny synthetic .npy image tree (the digits fallback
uses the identical code path; full run documented in
imagenet_eval_digits.json)."""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _load_module():
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    sys.path.insert(0, root)
    spec = importlib.util.spec_from_file_location(
        "imagenet_eval", os.path.join(root, "imagenet_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tree_walk_and_eval_loop(tmp_path, rng):
    ie = _load_module()
    from lowbitdnn_project_tpu.models import resnet

    hw = 32
    # two classes, 5 + 3 images, .npy uint8 HWC
    for cls, n in (("classA", 5), ("classB", 3)):
        d = tmp_path / cls
        d.mkdir()
        for i in range(n):
            np.save(str(d / f"{i}.npy"),
                    rng.integers(0, 256, size=(hw, hw, 3)).astype(np.uint8))
    samples, classes = ie.list_image_tree(str(tmp_path))
    assert classes == ["classA", "classB"] and len(samples) == 8
    assert {l for _, l in samples} == {0, 1}

    batches = list(ie.iter_batches(samples, hw, batch=3))
    assert [b[0].shape[0] for b in batches] == [3, 3, 2]
    assert all(b[0].dtype == np.uint8 for b in batches)

    # full evaluate_top1 through PrefetchLoader + the prequantized chain
    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=2, width=8)
    params = resnet.init_params(jax.random.key(0), cfg)
    x_cal = jnp.asarray(
        rng.normal(size=(4, hw, hw, 3)).astype(np.float32))
    scales = resnet.calibrate_act_scales(params, [x_cal], cfg)
    qp = resnet.quantize_params(params, cfg)
    top1, n = ie.evaluate_top1(qp, scales, cfg, samples, hw, batch=4,
                               mean=np.zeros(3, np.float32),
                               std=np.ones(3, np.float32))
    assert n == 8 and 0.0 <= top1 <= 1.0
