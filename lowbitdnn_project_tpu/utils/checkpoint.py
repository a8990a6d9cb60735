"""Quantized checkpoint format: int8/int4 weights + per-channel scales.

The reference has no checkpoint/resume at all (SURVEY.md §5 — intent only,
in commented state_dict hooks at QConv2d.py:24-32). This implements the real
thing: a single .npz holding all arrays under path keys plus a JSON manifest
describing the tree structure and QTensor metadata. INT4 weights are stored
nibble-packed (half the bytes on disk and in HBM-bound load paths).
"""
from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.quant import QTensor, pack_int4, unpack_int4
from lowbitdnn_project_tpu.models.layers import QConvParams, QLinearParams

_MANIFEST = "__manifest__.json"
# .lbq format version. 1 = {"__lbq_version__": 1, "tree": <spec>} manifest
# envelope. The reserved "__lbq_version__" key cannot collide with a
# flattened tree spec (every spec node uses its own __qtensor__/__dict__/...
# sentinel), so detection is exact, not heuristic. Files written before the
# envelope existed (bare <spec> manifest) load as version 0; round-3 files
# that used the un-reserved {"version", "tree"} envelope are still accepted
# (a bare spec root can never carry those two keys without a sentinel).
_FORMAT_VERSION = 1
_VERSION_KEY = "__lbq_version__"


def _flatten(node: Any, path: str, arrays: Dict[str, np.ndarray]) -> Any:
    """Returns a JSON-able structure mirror; arrays go to ``arrays``."""
    if isinstance(node, QTensor):
        vals = np.asarray(node.values)
        packed = node.bits == 4 and vals.shape[-1] % 2 == 0
        key = f"{path}.values"
        arrays[key] = np.asarray(pack_int4(jnp.asarray(vals))) if packed else vals
        arrays[f"{path}.scale"] = np.asarray(node.scale)
        has_zp = node.zero_point is not None
        if has_zp:
            arrays[f"{path}.zp"] = np.asarray(node.zero_point)
        return {"__qtensor__": {"bits": node.bits, "axis": node.axis,
                                "packed": packed, "shape": list(vals.shape),
                                "zp": has_zp}}
    if isinstance(node, QConvParams):
        return {"__qconv__": {
            "weight": _flatten(node.weight, f"{path}.weight", arrays),
            "bias": _flatten(node.bias, f"{path}.bias", arrays),
        }}
    if isinstance(node, QLinearParams):
        return {"__qlinear__": {
            "weight": _flatten(node.weight, f"{path}.weight", arrays),
            "bias": _flatten(node.bias, f"{path}.bias", arrays),
        }}
    if isinstance(node, dict):
        return {"__dict__": {k: _flatten(v, f"{path}/{k}", arrays)
                             for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        return {"__list__": [_flatten(v, f"{path}[{i}]", arrays)
                             for i, v in enumerate(node)],
                "__tuple__": isinstance(node, tuple)}
    if node is None:
        return {"__none__": True}
    if isinstance(node, (int, float, str, bool)):
        return {"__scalar__": node}
    arr = np.asarray(node)
    arrays[path] = arr
    return {"__array__": {"dtype": str(arr.dtype)}}


def _unflatten(spec: Any, path: str, arrays: Dict[str, np.ndarray]) -> Any:
    if "__qtensor__" in spec:
        meta = spec["__qtensor__"]
        vals = arrays[f"{path}.values"]
        if meta["packed"]:
            vals = np.asarray(unpack_int4(jnp.asarray(vals)))
        axis = meta["axis"]
        # .get: absent in version-0 files; int(...) — zero_point is static
        # Python-int metadata on QTensor (the on-disk array form is kept)
        zp = int(arrays[f"{path}.zp"]) if meta.get("zp") else None
        return QTensor(values=jnp.asarray(vals, jnp.int8),
                       scale=jnp.asarray(arrays[f"{path}.scale"]),
                       bits=meta["bits"], axis=axis, zero_point=zp)
    if "__qconv__" in spec:
        d = spec["__qconv__"]
        return QConvParams(
            weight=_unflatten(d["weight"], f"{path}.weight", arrays),
            bias=_unflatten(d["bias"], f"{path}.bias", arrays))
    if "__qlinear__" in spec:
        d = spec["__qlinear__"]
        return QLinearParams(
            weight=_unflatten(d["weight"], f"{path}.weight", arrays),
            bias=_unflatten(d["bias"], f"{path}.bias", arrays))
    if "__dict__" in spec:
        return {k: _unflatten(v, f"{path}/{k}", arrays)
                for k, v in spec["__dict__"].items()}
    if "__list__" in spec:
        seq = [_unflatten(v, f"{path}[{i}]", arrays)
               for i, v in enumerate(spec["__list__"])]
        return tuple(seq) if spec.get("__tuple__") else seq
    if "__none__" in spec:
        return None
    if "__scalar__" in spec:
        return spec["__scalar__"]
    if "__array__" in spec:
        return jnp.asarray(arrays[path])
    raise ValueError(f"bad manifest node at {path}: {spec}")


def save_quantized(path: str, tree: Any) -> None:
    """Save a (possibly nested) quantized parameter pytree to ``path``."""
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {}
    spec = _flatten(jax.device_get(tree), "root", arrays)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST,
                    json.dumps({_VERSION_KEY: _FORMAT_VERSION, "tree": spec}))
        for key, arr in arrays.items():
            buf = io.BytesIO()
            np.save(buf, arr, allow_pickle=False)
            zf.writestr(key + ".npy", buf.getvalue())


def load_quantized(path: str) -> Any:
    with zipfile.ZipFile(path, "r") as zf:
        spec = json.loads(zf.read(_MANIFEST))
        if isinstance(spec, dict) and _VERSION_KEY in spec:
            version, spec = spec[_VERSION_KEY], spec["tree"]
        elif (isinstance(spec, dict) and spec.keys() == {"version", "tree"}
              and isinstance(spec["version"], int)):
            # round-3 transitional envelope (before the reserved key)
            version, spec = spec["version"], spec["tree"]
        else:
            version = 0  # pre-envelope files: manifest IS the tree spec
        if version > _FORMAT_VERSION:
            raise ValueError(
                f".lbq format version {version} is newer than this reader "
                f"(supports <= {_FORMAT_VERSION})")
        arrays = {}
        for name in zf.namelist():
            if name == _MANIFEST:
                continue
            arrays[name[:-4]] = np.load(io.BytesIO(zf.read(name)),
                                        allow_pickle=False)
    return _unflatten(spec, "root", arrays)
