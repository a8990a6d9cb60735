"""Ablate block_l1 stages: where do the 14 us/img go?"""
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar

_H, _M, _MC, _MARG, _KPAD = 56, 3136, 1568, 64, 640

def _requant(acc, a, inv):
    f = jnp.maximum(acc.astype(jnp.float32) * a, 0.0)
    return jnp.clip(jnp.round(f * inv), -127.0, 127.0).astype(jnp.int8)

def _kernel(a1_ref, a3_ref, w1_ref, w2p_ref, w3_ref, x_hbm, out_ref,
            slab, h1x, patch, sem, *, mode: str):
    n = pl.program_id(0); j = pl.program_id(1)

    @pl.when(j == 0)
    def _per_image():
        dma = pltpu.make_async_copy(x_hbm.at[n], slab, sem)
        dma.start(); dma.wait()
        xf = slab[:].reshape(_M, 256)
        acc1 = jnp.dot(xf, w1_ref[:], preferred_element_type=jnp.int32)
        h1 = _requant(acc1, a1_ref[:], 20.0)
        h1x[0:_MARG, :] = jnp.zeros((_MARG, 64), jnp.int8)
        h1x[_MARG:_MARG + _M, :] = h1
        h1x[_MARG + _M:_MARG + _M + _MARG, :] = jnp.zeros((_MARG, 64), jnp.int8)

    def chunk(base):
        widx = jax.lax.broadcasted_iota(jnp.int32, (_MC, 64), 0) % _H
        if mode == "skip_c2":
            h2 = h1x[_MARG + base:_MARG + base + _MC, :]
        elif mode == "gemm9":
            acc2 = None
            for dy in range(3):
                for dx in range(3):
                    st = _MARG + base + (dy - 1) * _H + (dx - 1)
                    p = h1x[st:st + _MC, :]
                    if dx == 0: p = jnp.where(widx == 0, jnp.int8(0), p)
                    elif dx == 2: p = jnp.where(widx == _H - 1, jnp.int8(0), p)
                    d = jnp.dot(p, w2p_ref[(3*dy+dx)*64:(3*dy+dx+1)*64, :],
                                preferred_element_type=jnp.int32)
                    acc2 = d if acc2 is None else acc2 + d
            h2 = _requant(acc2, a1_ref[:], 20.0)
        elif mode in ("full", "no_tail", "aligned_taps"):
            for dy in range(3):
                for dx in range(3):
                    off = (dy - 1) * _H + (dx - 1)
                    if mode == "aligned_taps":
                        off = (off // 8) * 8   # WRONG results; isolates rotation cost
                    st = _MARG + base + off
                    p = h1x[st:st + _MC, :]
                    if dx == 0: p = jnp.where(widx == 0, jnp.int8(0), p)
                    elif dx == 2: p = jnp.where(widx == _H - 1, jnp.int8(0), p)
                    t = 3 * dy + dx
                    patch[:, t*64:(t+1)*64] = p
            patch[:, 576:_KPAD] = jnp.zeros((_MC, 64), jnp.int8)
            acc2 = jnp.dot(patch[:], w2p_ref[:], preferred_element_type=jnp.int32)
            h2 = _requant(acc2, a1_ref[:], 20.0)
        acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
        if mode == "no_tail":
            q = jnp.clip(acc3, -127, 127).astype(jnp.int8)
        else:
            hb = (acc3.astype(jnp.float32) * a3_ref[:]).astype(jnp.bfloat16)
            id8 = slab[:].reshape(_M, 256)[base:base + _MC, :]
            idb = (id8.astype(jnp.float32) * 0.02).astype(jnp.bfloat16)
            s = jnp.maximum(hb + idb, jnp.bfloat16(0))
            q = jnp.clip(jnp.round(s.astype(jnp.float32) / 0.07),
                         -127.0, 127.0).astype(jnp.int8)
        out_ref[0] = q.reshape(_H // 2, _H, 256)

    @pl.when(j == 0)
    def _c0(): chunk(0)
    @pl.when(j == 1)
    def _c1(): chunk(_MC)

@functools.partial(jax.jit, static_argnames=("mode",))
def call(x, a1, a3, w1, w2p, w3, mode):
    n = x.shape[0]
    vec = lambda r, c: pl.BlockSpec((r, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(n, 2),
        in_specs=[vec(1, 64), vec(1, 256), vec(256, 64), vec(_KPAD, 64),
                  vec(64, 256), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 28, 56, 256), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 56, 56, 256), jnp.int8),
        scratch_shapes=[pltpu.VMEM((56, 56, 256), jnp.int8),
                        pltpu.VMEM((_M + 2*_MARG, 64), jnp.int8),
                        pltpu.VMEM((_MC, _KPAD), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )(a1, a3, w1, w2p, w3, x)

rng = np.random.default_rng(0)
batch = 32
x = jnp.asarray(rng.integers(-100, 100, (batch, 56, 56, 256)), jnp.int8)
a1 = jnp.full((1, 64), 0.01, jnp.float32)
a3 = jnp.full((1, 256), 0.01, jnp.float32)
w1 = jnp.asarray(rng.integers(-30, 30, (256, 64)), jnp.int8)
w2p = jnp.asarray(rng.integers(-30, 30, (_KPAD, 64)), jnp.int8)
w3 = jnp.asarray(rng.integers(-30, 30, (64, 256)), jnp.int8)

modes = ["full", "gemm9", "skip_c2", "no_tail", "aligned_taps"]
best = {}
for _ in range(2):
    for m in modes:
        step = lambda c, m=m: chain_via_scalar(c, call(c, a1, a3, w1, w2p, w3, m))
        t = chained_device_time(step, x, lo=20, hi=220)
        best[m] = min(best.get(m, 1e9), t)
for m in modes:
    print(f"b{batch} {m:12s}: {best[m]*1e6:8.1f} us")
