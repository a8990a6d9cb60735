"""Quantization-aware training: STE fake-quant forward + SGD step.

The reference trains int8 nets two ways: gradient-free annealing
(python/df-optimization) and int8-as-conv backward experiments
(qconv2d.py:73-116 backward, proving int8 grads track float grads within
|delta| <= 1 — tests/main.py:54-66). The TPU engine's gradient path is QAT:
per-channel fake-quantization on weights with straight-through gradients
(quant/quantize.py), differentiated by jax.grad — no hand-written backward
kernels needed because XLA re-derives the transposed convs, which is exactly
what the reference's hand-written bwd kernels compute (conv with rotated
kernel, conv2DBackwardData3x3.cuh:61-64).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant import fake_quantize


def fake_quantize_tree(params: Any, bits: int = 8) -> Any:
    """Fake-quantize every conv (ndim 4, axis 3) and linear (ndim 2, axis 1)
    weight in a param pytree; 1-D tensors (BN, bias) pass through.

    Depthwise conv weights stay at 8 bits when bits < 8, matching deployment
    (models/mobilenet.py quantize_params dw_bits rationale) — fake-quant
    precision must mirror deploy precision or the fine-tune optimizes the
    wrong network. Depthwise is detected from the PARAM PATH (a "dw" dict
    key, the convention models/mobilenet.py:79 uses), not from the weight
    shape: a shape test (I==1) would misclassify any ordinary conv with
    cin==1 (e.g. a grayscale stem) and silently pin it to 8-bit fake-quant
    while deploy quantizes it at ``bits``."""
    def is_dw(path) -> bool:
        return any(isinstance(k, jax.tree_util.DictKey) and k.key == "dw"
                   for k in path)

    def go(path, x):
        if not isinstance(x, jax.Array) and not hasattr(x, "ndim"):
            return x
        if x.ndim == 4:
            b = 8 if (bits < 8 and is_dw(path)) else bits
            return fake_quantize(x, bits=b, axis=3)
        if x.ndim == 2:
            return fake_quantize(x, bits=bits, axis=1)
        return x

    return jax.tree_util.tree_map_with_path(go, params)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def _is_inexact(leaf: Any) -> bool:
    if isinstance(leaf, (bool, int)):
        return False
    if isinstance(leaf, float):
        return True
    return hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact)


def make_qat_train_step(
    apply_fn: Callable[[Any, jax.Array], jax.Array],
    bits: int = 8,
    lr: float = 1e-3,
    momentum: float = 0.0,
) -> Callable[..., Tuple[Any, jax.Array]]:
    """Build a jittable SGD step: loss = CE(apply_fn(fake_quant(params), x)).

    Returns (new_params, loss), or with momentum > 0 a step taking and
    returning an optimizer-state velocity list:
    ``step(params, x, labels, vel) -> (params, loss, vel)`` (heavy-ball;
    pass ``vel=None`` on the first call). Gradients flow through the
    fake-quant STE. Non-float pytree leaves are treated as static: passed
    through to apply_fn, excluded from grad.
    """
    def loss_fn(params, x, labels):
        qparams = fake_quantize_tree(params, bits=bits)
        logits = apply_fn(qparams, x)
        return cross_entropy(logits, labels)

    def step(params, x, labels, vel=None):
        flat, treedef = jax.tree_util.tree_flatten(params)
        diff_idx = [i for i, l in enumerate(flat) if _is_inexact(l)]

        def diff_loss(diff_leaves):
            full = list(flat)
            for i, v in zip(diff_idx, diff_leaves):
                full[i] = v
            return loss_fn(jax.tree_util.tree_unflatten(treedef, full),
                           x, labels)

        diff_leaves = [flat[i] for i in diff_idx]
        loss, grads = jax.value_and_grad(diff_loss)(diff_leaves)
        new_flat = list(flat)
        if momentum > 0.0:
            if vel is None:
                vel = [jnp.zeros_like(flat[i]) for i in diff_idx]
            vel = [momentum * v + g for v, g in zip(vel, grads)]
            for i, v in zip(diff_idx, vel):
                new_flat[i] = flat[i] - lr * v
            return (jax.tree_util.tree_unflatten(treedef, new_flat), loss,
                    vel)
        for i, g in zip(diff_idx, grads):
            new_flat[i] = flat[i] - lr * g
        return jax.tree_util.tree_unflatten(treedef, new_flat), loss

    return step
