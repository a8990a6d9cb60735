"""Device-side benchmark timing that survives hostile host<->device links.

The reference times kernels with in-launcher cudaEvents
(conv2DForward3x3TensorCores.cuh:734-748). On this TPU setup the host link
is a low-bandwidth relay and `block_until_ready` does not reliably fence
device execution, so host-side per-iteration timing is garbage (measured
"38 PFLOPS" on a 197 TFLOPS chip). Instead:

  * run ITERS chained iterations inside ONE jitted lax.fori_loop — the loop
    carry forces sequential device execution of every iteration;
  * fetch a single scalar (4 bytes) to force completion;
  * warm up every (fn, iters) variant first (compiles are cached);
  * time two iteration counts and difference them, cancelling dispatch and
    fetch latency: per_iter = (T(hi) - T(lo)) / (hi - lo).

The chain hook must fold the iteration output back into the next input with
negligible cost (e.g. xor a scalar derived from the output) so XLA cannot
elide or parallelize iterations.
"""
from __future__ import annotations

import functools
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def chained_device_time(
    step: Callable,              # carry[, *args] -> carry, the op under test
    init,                        # initial carry (device array(s))
    *,
    lo: int = 10,
    hi: int = 110,
    reps: int = 3,
    args: Tuple = (),
    compiler_options: dict | None = None,
) -> float:
    """Seconds per iteration of ``step``, measured on-device.

    ``step`` must be shape-preserving on its carry and cheap to chain.
    Pass large operands (weights, scales) via ``args`` rather than closing
    over them: closed-over arrays become XLA constants embedded in the
    executable (a ResNet-50 step measured a 98 MB serialized executable that
    took minutes to push through the relay); as jit arguments they stay on
    device and the executable is ~1 MB.
    """

    # compiler_options: XLA/libtpu env_option_overrides for THIS executable
    # only (e.g. {"xla_tpu_scoped_vmem_limit_kib": "8192"}) — the way to
    # probe TPU backend flags here, since client-side XLA_FLAGS parsing
    # rejects libtpu-only flag names (measured, xla_flags_ab r5).
    @functools.partial(jax.jit, compiler_options=compiler_options)
    def run_loop(init, iters, *args):
        # dynamic trip count: one compile serves every iteration count
        # (cold-start cost matters — each compile is a full model graph)
        out = jax.lax.fori_loop(0, iters, lambda i, c: step(c, *args), init)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        float(run_loop(init, jnp.asarray(iters, jnp.int32), *args))
        return time.perf_counter() - t0

    for iters in (lo, hi):      # compile + warm both variants
        timed(iters)
    # median over reps: min-of-deltas can go negative under relay jitter
    # (observed as 0.0us records) — median is robust to one bad sample
    t_lo = sorted(timed(lo) for _ in range(reps))[reps // 2]
    t_hi = sorted(timed(hi) for _ in range(reps))[reps // 2]
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def chain_via_scalar(x: jax.Array, out: jax.Array) -> jax.Array:
    """Fold ``out`` into ``x``, depending on EVERY element of ``out``.

    Keeps x's shape/dtype. The full-tensor reduction is mandatory: a partial
    dependency (e.g. out[0]) lets XLA slice the benched op down to computing
    one element (observed: a conv "running" at 4x the chip's peak). When the
    op output is shape-compatible with its input, prefer feeding it back
    directly in a custom step instead — zero overhead.
    """
    s = jnp.sum(out)
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x ^ (s.astype(x.dtype) & 1)
    # s*0 is not foldable (NaN/Inf semantics), so the dependency survives.
    return x + (s.astype(x.dtype) * 0.0)


def matmul_step(b: jax.Array, fn: Callable) -> Callable:
    """Carry = int8 A matrix; step = fn(A, b) folded back into A."""
    def step(a):
        out = fn(a, b)
        return chain_via_scalar(a, out)
    return step
