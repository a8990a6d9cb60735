"""Pure-int8 MNIST classifier — parity with the reference's annealing model.

Reference: QCNNClassifier (python/tmp.py:31-59) — four Int8Conv2d layers with
int8 weights as direct (gradient-free) parameters, int8 activations
re-quantized after every layer (Int8Conv2d.py:32-35 forward takes & returns
scale), max-pool between, trained by simulated annealing (tmp.py:140-150).
Input images are int8 with a fixed scale (ToInt8Tensor, tmp.py:12-27), 1->4
channel padding (tmp.py:41) becomes a plain 4-channel quantize here (NHWC
needs no VECT_C padding trick on TPU).

The whole forward is integer except the per-layer scale bookkeeping: exactly
the regime the annealing trainer optimizes in.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant import QTensor, quantize
from lowbitdnn_project_tpu.ops import qconv2d, qmax_pool2d

# (cin, cout, ksize, maxpool_after) per layer; 28x28 -> 14 -> 7 -> 3 -> 1
ARCH = [
    (1, 8, 3, True),
    (8, 16, 3, True),
    (16, 32, 3, True),
    (32, 10, 3, False),   # final 3x3 over the 3x3 map = classifier head
]
INPUT_SCALE = 1.0 / 127.0  # fixed input scale (ref tmp.py:12-27 fixed transform)


def init_params(key: jax.Array) -> List[QTensor]:
    """Random int8 weight QTensors — the annealing search space
    (int8 Parameters, Int8Conv2d.py:24-25)."""
    params = []
    for i, (cin, cout, k, _) in enumerate(ARCH):
        key, sub = jax.random.split(key)
        w = jax.random.randint(sub, (k, k, cin, cout), -32, 33, jnp.int8)
        scale = jnp.asarray(1.0 / (k * k * cin * 8), jnp.float32)
        params.append(QTensor(values=w, scale=scale))
    return params


def apply(params: List[QTensor], images: jax.Array, *,
          backend: str = "xla") -> jax.Array:
    """images: float (N, 28, 28, 1) in [0, 1]. Returns (N, 10) logits.

    Every conv runs int8 with a dynamically-requantized int8 output
    (the reference's pure-int8 "internal" chain)."""
    x_q = quantize(images, scale=jnp.asarray(INPUT_SCALE))
    for i, (w, (cin, cout, k, pool)) in enumerate(zip(params, ARCH)):
        last = i == len(ARCH) - 1
        # float epilogue out, then dynamic requantize for the next layer —
        # except the head, which returns float logits
        out = qconv2d(x_q, w, padding=0 if last else 1,
                      relu=not last, backend=backend)
        if last:
            return out.reshape(out.shape[0], -1)
        x_q = quantize(out)
        if pool:
            x_q = qmax_pool2d(x_q, 2, 2)
    raise AssertionError("unreachable")
