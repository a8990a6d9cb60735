"""Activation-scale calibration for static quantization.

The reference quantizes activations dynamically per batch
(qconv2d.py:52-56 quantizes inputs inside every forward). Dynamic absmax
costs an extra pass over the activation in HBM; a production engine
calibrates once and bakes static scales. Strategies here:

  * absmax   — running max of |x| (the reference's rule, quantization.py:90-110)
  * sigma    — mean + k·std coverage, the ±4σ methodology the reference uses to
               justify Winograd-domain ranges (weights.py:8-26)
  * percentile — clip to the p-th percentile of |x|

MEASURED VERDICT (accuracy_parity.json, round 3/4 A/B on the trained QAT
ResNet): for ACTIVATION calibration sigma(k=4) is dominated — int8 logit
relerr 0.2101 vs 0.0662 (absmax) and 0.0596 (percentile). sigma's role in
the reference is bounding WEIGHT ranges in the Winograd transform domain
(weights.py:8-26), where the distribution is near-Gaussian; conv
activations are post-ReLU half-Gaussians with heavy tails, where a ±kσ
window clips far too aggressively. Use absmax or percentile for
activations; sigma stays available for transform-domain weight ranges
(ops/winograd.py calibration) only.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lowbitdnn_project_tpu.quant.qtensor import QMAX


class Calibrator:
    """Accumulates activation statistics over calibration batches.

    Usage: create one per activation site, call ``observe(x)`` on each
    calibration batch (host-side; values are pulled to host as numpy),
    then ``scale(bits)`` for the static scale.
    """

    def __init__(self, strategy: str = "absmax", sigma_k: float = 4.0,
                 percentile: float = 99.99):
        """strategy: "absmax" (default) or "percentile" for activations;
        "sigma" is measurably dominated for activation calibration (3x the
        logit error of absmax, see module docstring) and is kept only for
        the transform-domain weight-range role it has in the reference."""
        if strategy not in ("absmax", "sigma", "percentile"):
            raise ValueError(f"unknown calibration strategy {strategy!r}")
        self.strategy = strategy
        self.sigma_k = sigma_k
        self.percentile = percentile
        self._absmax = 0.0
        self._count = 0
        self._sum = 0.0
        self._sumsq = 0.0
        self._abs_samples = []

    def observe(self, x: jax.Array) -> None:
        import numpy as np

        xf = np.asarray(jax.device_get(x), dtype=np.float32)
        self._absmax = max(self._absmax, float(np.max(np.abs(xf))))
        self._count += xf.size
        self._sum += float(xf.sum())
        self._sumsq += float((xf.astype(np.float64) ** 2).sum())
        if self.strategy == "percentile":
            # Subsample to bound memory over many batches.
            flat = np.abs(xf).ravel()
            if flat.size > 65536:
                idx = np.random.default_rng(0).choice(flat.size, 65536, replace=False)
                flat = flat[idx]
            self._abs_samples.append(flat)

    def range_max(self) -> float:
        import numpy as np

        if self._count == 0:
            raise ValueError("observe() at least one batch before reading scale")
        if self.strategy == "absmax":
            return self._absmax
        if self.strategy == "sigma":
            mean = self._sum / self._count
            var = max(self._sumsq / self._count - mean * mean, 0.0)
            # ±kσ window around the mean, clipped to the true absmax
            # (reference weights.py:20-26 computes 4σ coverage of |w|).
            return float(min(abs(mean) + self.sigma_k * var ** 0.5, self._absmax))
        samples = np.concatenate(self._abs_samples)
        return float(np.percentile(samples, self.percentile))

    def scale(self, bits: int = 8) -> jax.Array:
        return jnp.asarray(max(self.range_max(), 1e-12) / QMAX[bits], jnp.float32)


def calibrate_model(apply_fn, params, batches, tap_names) -> Dict[str, jax.Array]:
    """Run calibration batches through ``apply_fn`` capturing named activation taps.

    ``apply_fn(params, x, capture: dict)`` must fill ``capture[name]`` for each
    name in ``tap_names``. Returns name → static scale (int8).
    """
    cals = {name: Calibrator() for name in tap_names}
    for batch in batches:
        capture: Dict[str, jax.Array] = {}
        apply_fn(params, batch, capture)
        for name in tap_names:
            cals[name].observe(capture[name])
    return {name: cal.scale(8) for name, cal in cals.items()}
