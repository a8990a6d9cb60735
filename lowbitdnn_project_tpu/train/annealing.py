"""Simulated-annealing trainer for pure-int8 networks (gradient-free).

Reference parity: python/df-optimization/simulated_annealing/ —
  engine.py:9-58   main loop: per-tensor then all-tensor proposal sweep,
                   restart-on-cold, in-place accept/restore
  annealing.py:13-58  fast_annealing (Cauchy-like visit) and
                   generalized_annealing (GSA visiting distribution)
  temperature.py:7-21  linear / log / gsa schedules
  acceptance.py:8-19   metropolis / gsa acceptance probabilities
  history.py:5-27  top-k parameter history

JAX re-expression: parameters are int8 weight pytrees (QTensors); proposals
perturb the integer weights directly on device; the objective (a full int8
forward over the eval set) is jitted once and re-run per proposal — the hot
loop of the reference (tmp.py:140-150, full-dataset forward per proposal).
Host-side control flow mirrors the reference's engine (annealing is
inherently sequential; the device work per step is the jitted objective).
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- schedules

def linear_schedule(t0: float, step: int, rate: float = 0.99) -> float:
    """Geometric decay t0*rate^step — REPLACES the reference's
    linear_schedule (temperature.py:7-9, t0/step): t0/step collapses by 50%
    after one step on integer-weight proposals; geometric decay keeps early
    exploration alive. Deliberate redesign, not a port."""
    return t0 * (rate ** step)


def log_schedule(t0: float, step: int) -> float:
    """temperature.py:12-14 — t0 / log(2+step)."""
    return t0 / math.log(2.0 + step)


def gsa_schedule(t0: float, step: int, qv: float = 2.62) -> float:
    """temperature.py:17-21 — generalized simulated annealing visiting temp."""
    num = 2.0 ** (qv - 1.0) - 1.0
    den = (2.0 + step) ** (qv - 1.0) - 1.0
    return t0 * num / den


# ------------------------------------------------------------- proposals

def fast_annealing_visit(key, x: jax.Array, temp: float,
                         qmax: int = 127) -> jax.Array:
    """Cauchy visiting distribution on int weights:
    x' = round(x + temp * tan(pi*(u - 1/2))), clamped to the int range.
    Fills the role of the reference's fast_annealing (annealing.py:13-20),
    which uses a pow-based step — tan-Cauchy is the standard FSA visit and
    vectorizes cleanly on the VPU; a redesign, not a port."""
    u = jax.random.uniform(key, x.shape, jnp.float32)
    step = temp * jnp.tan(jnp.pi * (u - 0.5))
    prop = jnp.round(x.astype(jnp.float32) + step)
    return jnp.clip(prop, -qmax, qmax).astype(x.dtype)


def generalized_annealing_visit(key, x: jax.Array, temp: float,
                                qv: float = 2.62, qmax: int = 127) -> jax.Array:
    """Heavy-tailed GSA-style visiting step (standard Tsallis ratio
    sampler). Fills the role of the reference's generalized_annealing
    (annealing.py:23-58) without reproducing its exact distribution."""
    k1, k2 = jax.random.split(key)
    factor = (qv - 1.0)
    gauss = jax.random.normal(k1, x.shape, jnp.float32)
    expo = jax.random.exponential(k2, x.shape, jnp.float32)
    # heavy-tailed ratio sampler; reduces to Cauchy-ish for qv ~ 2.62
    denom = jnp.power(jnp.maximum(expo, 1e-9), factor / (3.0 - qv))
    step = temp ** (1.0 / (3.0 - qv)) * gauss / denom
    prop = jnp.round(x.astype(jnp.float32) + step)
    return jnp.clip(prop, -qmax, qmax).astype(x.dtype)


# ------------------------------------------------------------- acceptance

def metropolis_acceptance(delta: float, temp: float, step: int) -> float:
    """Classic Metropolis exp(-delta/T), 1 if improving. The reference's
    metropolis (acceptance.py:8-12) uses the logistic 1/(1+exp(delta/T));
    this uses the textbook rule — same role, different formula."""
    if delta <= 0:
        return 1.0
    return math.exp(-delta / max(temp, 1e-12))


def gsa_acceptance(delta: float, temp: float, step: int,
                   qa: float = -5.0) -> float:
    """acceptance.py:15-19 — generalized acceptance probability."""
    if delta <= 0:
        return 1.0
    base = 1.0 + (qa - 1.0) * delta / max(temp, 1e-12)
    if base <= 0:
        return 0.0
    return base ** (1.0 / (1.0 - qa))


# ---------------------------------------------------------------- history

class ParameterHistory:
    """history.py:5-27 — keep the top-k best parameter sets seen."""

    def __init__(self, k: int = 5):
        self.k = k
        self.items: List[Tuple[float, Any]] = []

    def update(self, energy: float, params: Any) -> None:
        self.items.append((energy, jax.tree_util.tree_map(jnp.copy, params)))
        self.items.sort(key=lambda it: it[0])
        del self.items[self.k:]

    @property
    def best(self) -> Tuple[float, Any]:
        return self.items[0]


class AnnealingResult(NamedTuple):
    params: Any
    energy: float
    history: ParameterHistory
    energies: List[float]


def simulated_annealing(
    params: List[jax.Array],
    objective: Callable[[List[jax.Array]], float],
    *,
    steps: int = 100,
    t0: float = 10.0,
    visit=fast_annealing_visit,
    schedule=linear_schedule,
    acceptance=metropolis_acceptance,
    restart_temp: float = 1e-3,
    top_k: int = 5,
    seed: int = 0,
) -> AnnealingResult:
    """engine.py:9-58 re-expressed: each step sweeps proposal subsets —
    every tensor alone, then all tensors together (engine.py:31-45) — and
    restarts from the best-seen params when the temperature goes cold
    (engine.py:22-24)."""
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    params = [jnp.asarray(p) for p in params]
    energy = float(objective(params))
    history = ParameterHistory(top_k)
    history.update(energy, params)
    energies = [energy]

    # restart re-warms the schedule by resetting the effective step counter
    # (a pure schedule(t0, step) would go straight back below restart_temp
    # and degenerate into restarting every iteration)
    restart_at = 0
    for step in range(steps):
        temp = schedule(t0, step - restart_at)
        if temp < restart_temp:
            energy, best = history.best
            params = [jnp.copy(p) for p in best]
            restart_at = step
            temp = schedule(t0, 0)
        # subsets: each tensor individually, then all at once
        subsets = [[i] for i in range(len(params))] + [list(range(len(params)))]
        for subset in subsets:
            key, *pkeys = jax.random.split(key, len(subset) + 1)
            proposal = list(params)
            for idx, pk in zip(subset, pkeys):
                proposal[idx] = visit(pk, params[idx], temp)
            new_energy = float(objective(proposal))
            delta = new_energy - energy
            if rng.random() < acceptance(delta, temp, step):
                params, energy = proposal, new_energy
                history.update(energy, params)
        energies.append(energy)
    best_energy, best_params = history.best
    return AnnealingResult(best_params, best_energy, history, energies)
