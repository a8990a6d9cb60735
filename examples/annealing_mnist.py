"""Gradient-free int8 training demo — the reference's python/tmp.py experiment
re-expressed: a pure-int8 4-conv classifier trained by simulated annealing.

Datasets: "digits" (default) = sklearn's REAL handwritten-digit images
(10 classes, the offline stand-in for the reference's real MNIST,
tmp.py:100-121); "synthetic" = the round-1 quadrant-blob 4-class set.

Run: python examples/annealing_mnist.py [steps] [digits|synthetic]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import mnist
from lowbitdnn_project_tpu.quant import QTensor
from lowbitdnn_project_tpu.train import (
    fast_annealing_visit,
    linear_schedule,
    metropolis_acceptance,
    simulated_annealing,
)


def synthetic_digits(rng, n, classes=4):
    x = np.zeros((n, 28, 28, 1), np.float32)
    y = rng.integers(0, classes, n)
    for i, c in enumerate(y):
        r, col = divmod(int(c), 2)
        x[i, r * 14:(r + 1) * 14, col * 14:(col + 1) * 14, 0] = 1.0
    x += rng.normal(0, 0.15, x.shape).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    dataset = sys.argv[2] if len(sys.argv) > 2 else "digits"
    rng = np.random.default_rng(0)
    if dataset == "digits":
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from _datasets import load_digits_split

        x_train, y_train, x_test, y_test = load_digits_split()
        print(f"dataset: sklearn digits (REAL images), "
              f"train {len(x_train)} / test {len(x_test)}")
    else:
        x_train, y_train = synthetic_digits(rng, 256)
        x_test, y_test = synthetic_digits(rng, 128)

    params = mnist.init_params(jax.random.key(0))
    weights = [p.values for p in params]
    scales = [p.scale for p in params]

    @jax.jit
    def error_rate(ws, x, y):
        qs = [QTensor(values=w, scale=s) for w, s in zip(ws, scales)]
        logits = mnist.apply(qs, x)
        return jnp.mean((jnp.argmax(logits, -1) != y).astype(jnp.float32))

    print(f"initial train error: {float(error_rate(weights, x_train, y_train)):.3f}")
    result = simulated_annealing(
        weights,
        lambda ws: float(error_rate(ws, x_train, y_train)),
        steps=steps, t0=10.0,
        visit=fast_annealing_visit,
        schedule=linear_schedule,
        acceptance=metropolis_acceptance,
        seed=1,
    )
    print(f"best train error:    {result.energy:.3f}")
    test_err = float(error_rate(result.params, x_test, y_test))
    print(f"test error:          {test_err:.3f}")


if __name__ == "__main__":
    main()
