"""Cost breakdown of stem v2: which stage eats the 646 us?

Variants (same grid/IO shapes where possible):
  gemm   : patch build + main GEMM, store raw acc slice (no epilogue/pool)
  pool   : + int32 3x3 pool (no requant, no select)
  requant: + float epilogue
  full   : everything incl. the per-r select/transpose matmuls (= v2)
"""
import sys
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.quant import quantize
from lowbitdnn_project_tpu.kernels import stem_fused as sf
from lowbitdnn_project_tpu.utils.timing import chained_device_time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
_R = sf._R
_NEG = sf._NEG


def make_kernel(stage):
    def kern(alpha_ref, beta_ref, invos_ref, planes_ref, w_ref, selt_ref,
             out_ref, carry_ref):
        j = pl.program_id(1)
        alpha = alpha_ref[:]
        beta = beta_ref[:]
        inv_os = invos_ref[0, 0]
        w2 = w_ref[:]
        sel_t = selt_ref[:]
        wide = 128 * _R

        @pl.when(j == 0)
        def _init():
            carry_ref[:] = jnp.full((64, 128), _NEG, jnp.int32)

        def body(x_ref):
            for r in range(_R):
                x9 = planes_ref[0, pl.ds(56 * j + 4 * r, 9), :, :]
                x_ref[:, 128 * r:128 * (r + 1)] = x9.reshape(72, 128)
            x = x_ref[:]
            x4 = jnp.concatenate(
                [x, sf._roll8(x, 1), sf._roll8(x, 2), sf._roll8(x, 3)],
                axis=0)
            acc = jax.lax.dot_general(
                w2, x4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if stage == "gemm":
                # cheap int8 store of a slice, same out shape
                for r in range(_R):
                    out_ref[0, pl.ds(_R * j + r, 1), :, :] = (
                        acc[0:56, 128 * r:128 * r + 64]
                        .astype(jnp.int8).reshape(1, 56, 64))
                return
            acc0, acc1 = acc[0:64, :], acc[64:128, :]
            prev1 = jnp.concatenate(
                [carry_ref[:], acc1[:, :wide - 128]], axis=1)
            carry_ref[:] = acc1[:, wide - 128:]
            rowmax = jnp.maximum(jnp.maximum(prev1, acc0), acc1)
            mr = pltpu.roll(rowmax, shift=wide - 1, axis=1)
            ml = pltpu.roll(rowmax, shift=1, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (64, wide), 1)
            ml = jnp.where(lane % 128 == 0, jnp.int32(_NEG), ml)
            m3 = jnp.maximum(jnp.maximum(ml, rowmax), mr)
            if stage == "pool":
                for r in range(_R):
                    out_ref[0, pl.ds(_R * j + r, 1), :, :] = (
                        m3[0:56, 128 * r:128 * r + 64]
                        .astype(jnp.int8).reshape(1, 56, 64))
                return
            f = m3.astype(jnp.float32) * alpha + beta
            f = jnp.maximum(f, 0.0)
            q = jnp.clip(jnp.round(f * inv_os), -127.0, 127.0).astype(jnp.int8)
            if stage == "requant":
                for r in range(_R):
                    out_ref[0, pl.ds(_R * j + r, 1), :, :] = (
                        q[0:56, 128 * r:128 * r + 64].reshape(1, 56, 64))
                return
            for r in range(_R):
                out_t = jax.lax.dot_general(
                    sel_t, q[:, 128 * r:128 * (r + 1)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.int8)
                out_ref[0, pl.ds(_R * j + r, 1), :, :] = (
                    out_t[0:56, :].reshape(1, 56, 64))

        pl.run_scoped(body, pltpu.VMEM((72, wide), jnp.int8))
    return kern


def call(stage, planes, w2, alpha, beta, inv_os, sel_t):
    n = planes.shape[0]
    return pl.pallas_call(
        make_kernel(stage),
        grid=(n, 56 // _R),
        in_specs=[
            pl.BlockSpec((64, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 232, 8, 128), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 288), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 56, 56, 64), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 56, 56, 64), jnp.int8),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.int32)],
    )(alpha, beta, inv_os, planes, w2, sel_t)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, 224, 224, 3)).astype(np.float32) * 2)
w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
x_q = quantize(x, bits=8)
w_q = quantize(w, bits=8, axis=3)
planes0 = jax.jit(sf.stem_plane_input)(x_q.values)
w2 = sf.stem_plane_filter(w_q.values)
alpha = (x_q.scale * w_q.scale_vector()).astype(jnp.float32).reshape(64, 1)
beta = jnp.zeros((64, 1), jnp.float32)
inv_os = jnp.full((1, 1), 20.0, jnp.float32)
sel_t = sf._pool_select_t()

print(f"batch {N}", flush=True)

STAGES = ["gemm", "pool", "requant", "full", "prep_only"]


def step_of(stage):
    if stage == "prep_only":
        def step(xv):
            p = sf.stem_plane_input(xv)
            s = jnp.sum(p.astype(jnp.int32)) % 2
            return xv ^ s.astype(jnp.int8)
        return step

    @functools.partial(jax.jit, static_argnames=())
    def run(planes):
        return call(stage, planes, w2, alpha, beta, inv_os, sel_t)

    def step(planes):
        out = run(planes)
        s = jnp.sum(out.astype(jnp.int32)) % 2
        return planes ^ s.astype(jnp.int8)
    return step

times = {k: [] for k in STAGES}
for p in range(2):
    for st in STAGES:
        init = x_q.values if st == "prep_only" else planes0
        t = chained_device_time(step_of(st), init, lo=20, hi=220, reps=3)
        times[st].append(t)
        print(f"pass{p} {st}: {t*1e6:.1f} us", flush=True)
print("---- min of passes ----")
for k, ts in times.items():
    print(f"{k}: {min(ts)*1e6:.1f} us")
