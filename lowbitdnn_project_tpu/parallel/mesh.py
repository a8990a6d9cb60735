"""Device mesh construction for DP x TP inference/training.

The reference is single-GPU (SURVEY.md §2: grep-verified no NCCL/MPI/
collectives); this layer is new, required by the BASELINE north star:
batch-parallel over hosts (DCN), channel-sharded weights over ICI.

Axes:
  "data"  — batch parallelism (maps to DCN across hosts, ICI within)
  "model" — output-channel (K) tensor parallelism (ICI); the same axis can
            instead carry spatial (H) sharding with halo exchange — the CNN
            analogue of sequence parallelism (parallel/spatial.py)

PP lives on its own 1-D "stage" mesh (parallel/pipeline.py: GPipe-style
microbatch pipeline for homogeneous residual towers). Expert parallelism is
deliberately absent: a CNN engine has no expert dimension (SURVEY.md §2
parallelism table documents the reference's absence of each).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    import numpy as np

    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch over "data", everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
