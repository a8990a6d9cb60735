"""Quantized checkpoint round-trip tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.quant import QTensor, quantize
from lowbitdnn_project_tpu.utils.checkpoint import load_quantized, save_quantized

TINY = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=False,
                           num_classes=10, width=8)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resnet_qparams_roundtrip(tmp_path, rng):
    params = resnet.init_params(jax.random.key(0), TINY)
    qparams = resnet.quantize_params(params, TINY)
    p = str(tmp_path / "r18.lbq")
    save_quantized(p, qparams)
    loaded = load_quantized(p)
    _trees_equal(qparams, loaded)
    # loaded params must run
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    out = resnet.apply_quantized(loaded, x, TINY, backend="xla")
    want = resnet.apply_quantized(qparams, x, TINY, backend="xla")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_int4_packed_on_disk(tmp_path, rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    q4 = quantize(w, bits=4, axis=3)
    q8 = quantize(w, bits=8, axis=3)
    p4, p8 = str(tmp_path / "w4.lbq"), str(tmp_path / "w8.lbq")
    save_quantized(p4, {"w": q4})
    save_quantized(p8, {"w": q8})
    loaded = load_quantized(p4)["w"]
    assert loaded.bits == 4 and loaded.axis == 3
    np.testing.assert_array_equal(np.asarray(loaded.values),
                                  np.asarray(q4.values))
    # int4 payload should be materially smaller than int8
    assert os.path.getsize(p4) < os.path.getsize(p8) * 0.75


def test_mixed_tree_roundtrip(tmp_path):
    tree = {
        "scales": {"a": jnp.asarray(0.5), "b": None},
        "list": [jnp.ones((2, 2)), (jnp.zeros((3,)), 7)],
        "qt": QTensor(values=jnp.ones((4, 4), jnp.int8),
                      scale=jnp.asarray(0.1), bits=8, axis=None),
        "flag": True,
        "name": "model",
    }
    p = str(tmp_path / "mixed.lbq")
    save_quantized(p, tree)
    loaded = load_quantized(p)
    assert loaded["flag"] is True and loaded["name"] == "model"
    assert loaded["scales"]["b"] is None
    assert isinstance(loaded["list"][1], tuple) and loaded["list"][1][1] == 7
    np.testing.assert_array_equal(np.asarray(loaded["qt"].values),
                                  np.ones((4, 4)))


def test_version_envelope_reserved_key(tmp_path):
    """The manifest envelope uses the reserved __lbq_version__ key; a user
    tree with 'version'/'tree' keys must round-trip unscathed, and the
    round-3 transitional {'version', 'tree'} envelope must still load."""
    import io
    import json
    import zipfile

    tree = {"version": 3, "tree": {"depth": jnp.asarray(2.0)}}
    p = str(tmp_path / "v.lbq")
    save_quantized(p, tree)
    with zipfile.ZipFile(p) as zf:
        manifest = json.loads(zf.read("__manifest__.json"))
    assert manifest["__lbq_version__"] == 1
    loaded = load_quantized(p)
    assert loaded["version"] == 3
    np.testing.assert_allclose(np.asarray(loaded["tree"]["depth"]), 2.0)

    # rewrite as the round-3 transitional envelope: still loads
    with zipfile.ZipFile(p) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    legacy = {"version": manifest["__lbq_version__"],
              "tree": manifest["tree"]}
    p2 = str(tmp_path / "v_legacy.lbq")
    with zipfile.ZipFile(p2, "w") as zf:
        for n, data in names.items():
            zf.writestr(n, json.dumps(legacy) if n == "__manifest__.json"
                        else data)
    loaded2 = load_quantized(p2)
    assert loaded2["version"] == 3
