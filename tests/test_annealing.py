"""Annealing trainer tests — reference df-optimization/tmp.py re-expressed.

No MNIST data ships in this environment (zero egress), so the experiment
trains on a synthetic separable image dataset; what matters is parity of the
machinery: pure-int8 forward objective, proposal sweeps, schedules,
acceptance, top-k history, restart.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import mnist
from lowbitdnn_project_tpu.quant import QTensor
from lowbitdnn_project_tpu.train.annealing import (
    ParameterHistory,
    fast_annealing_visit,
    gsa_acceptance,
    gsa_schedule,
    linear_schedule,
    log_schedule,
    metropolis_acceptance,
    simulated_annealing,
)


def synthetic_digits(rng, n=64, classes=4):
    """Class-dependent quadrant blobs on 28x28 — separable by a small CNN."""
    x = np.zeros((n, 28, 28, 1), np.float32)
    y = rng.integers(0, classes, n)
    for i, c in enumerate(y):
        r, col = divmod(int(c), 2)
        x[i, r * 14:(r + 1) * 14, col * 14:(col + 1) * 14, 0] = 1.0
    x += rng.normal(0, 0.1, x.shape).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_schedules_monotone():
    for sched in (linear_schedule, log_schedule, gsa_schedule):
        temps = [sched(10.0, s) for s in range(50)]
        # log schedule starts at t0/log(2) > t0; only monotone decay matters
        assert all(b < a for a, b in zip(temps, temps[1:]))
        assert all(t > 0 for t in temps)


def test_acceptance_semantics():
    # improving moves always accepted
    assert metropolis_acceptance(-1.0, 0.5, 0) == 1.0
    assert gsa_acceptance(-1.0, 0.5, 0) == 1.0
    # worsening moves accepted with p < 1, decreasing in delta
    p1 = metropolis_acceptance(0.1, 0.5, 0)
    p2 = metropolis_acceptance(1.0, 0.5, 0)
    assert 0 < p2 < p1 < 1


def test_visit_stays_in_range(rng):
    x = jnp.asarray(rng.integers(-127, 128, (16, 16)), jnp.int8)
    v = fast_annealing_visit(jax.random.key(0), x, temp=5.0)
    assert v.dtype == jnp.int8
    assert int(jnp.max(v)) <= 127 and int(jnp.min(v)) >= -127
    assert not np.array_equal(np.asarray(v), np.asarray(x))  # moved


def test_history_topk():
    h = ParameterHistory(2)
    for e in [5.0, 1.0, 3.0, 0.5]:
        h.update(e, [jnp.zeros(1)])
    assert [it[0] for it in h.items] == [0.5, 1.0]
    assert h.best[0] == 0.5


def test_annealing_improves_int8_mnist(rng):
    """End-to-end: annealing must reduce the error of the pure-int8 CNN
    (reference tmp.py:140-150 objective = error over the dataset)."""
    x, y = synthetic_digits(rng, n=32)
    params = mnist.init_params(jax.random.key(0))
    weights = [p.values for p in params]
    scales = [p.scale for p in params]

    @jax.jit
    def err(ws):
        qs = [QTensor(values=w, scale=s) for w, s in zip(ws, scales)]
        logits = mnist.apply(qs, x)
        return jnp.mean((jnp.argmax(logits, -1) != y).astype(jnp.float32))

    e0 = float(err(weights))
    res = simulated_annealing(weights, lambda ws: float(err(ws)),
                              steps=6, t0=8.0, seed=1)
    assert res.energy <= e0
    assert len(res.energies) == 7
