"""Offline real-image dataset for accuracy evidence: sklearn's digits.

The zero-egress image has no MNIST/ImageNet download path, but
scikit-learn ships the classic UCI handwritten-digits dataset (1797 real
8x8 grayscale digit images, 10 classes) inside the wheel — REAL data, the
small cousin of the reference's MNIST experiment (python/tmp.py:100-121).
Used by examples/accuracy_parity.py (QAT parity on real data) and
examples/annealing_mnist.py (gradient-free training on real data).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def load_digits_split(hw: int = 28, channels: int = 1, train_n: int = 1200,
                      seed: int = 0, standardize: bool = False):
    """(x_train, y_train, x_test, y_test): real digit images bilinearly
    resized from 8x8 to (hw, hw, channels).

    standardize=True mean-centers / unit-scales using TRAIN statistics
    (the usual torchvision-Normalize step, reference python/tmp.py:104).
    Raw [0,1] images (mean ~0.3, std ~0.3) stall MobileNet-V2's
    momentum-SGD QAT at the 2.33 plateau; standardized, it trains.
    Default is FALSE (raw [0,1]): the annealing int8-MNIST model
    (models/mnist.py) documents [0,1] inputs and quantizes with a fixed
    scale of 1/127 — standardized pixels (range ~[-1, +2.3]) would saturate
    every bright pixel at the clip and flatten contrast (ADVICE r4). The
    MobileNet QAT experiments opt in explicitly."""
    from sklearn.datasets import load_digits

    d = load_digits()
    x = d.images.astype(np.float32) / 16.0            # (1797, 8, 8)
    y = d.target.astype(np.int32)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(x))
    x, y = x[order], y[order]
    xj = jnp.asarray(x)[..., None]                    # (N, 8, 8, 1)
    xj = jax.image.resize(xj, (len(x), hw, hw, 1), "bilinear")
    if channels > 1:
        xj = jnp.tile(xj, (1, 1, 1, channels))
    if standardize:
        mu = jnp.mean(xj[:train_n])
        sd = jnp.std(xj[:train_n]) + 1e-6
        xj = (xj - mu) / sd
    yj = jnp.asarray(y)
    return (xj[:train_n], yj[:train_n], xj[train_n:], yj[train_n:])
