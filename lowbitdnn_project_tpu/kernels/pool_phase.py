"""Pallas phase-domain maxpool for the space-to-depth ResNet stem.

Consumes the (N, 28, 28, (py, px, k) = 1024) int8 output of the 8x8-fold
stem conv (ops/stem.py) and produces the 3x3/s2/p1 maxpool of the virtual
(N, 112, 112, 64) image — without ever materializing a depth-to-space
transpose. XLA emits this pooling as HBM-bounced int8 relayout loops at
<5% of bandwidth (measured 808 us at batch 128); this kernel keeps the
whole image resident in VMEM and runs at ~50% of HBM bandwidth
(73 us @ b32, 330 us @ b128 measured — 7-11x over XLA).

Reference analogue: the dedicated int8 max-pool op the reference keeps next
to its conv bindings (python/qtorch/nn/functional: quantized pooling staying
in the int8 domain); here it is additionally specialized to the stem's s2d
layout, in the reference's shape-specialized-kernel spirit
(cpp/int8conv/check.cu:31-50).

Layout algebra (everything stays tile-aligned, no relayouts):
  * py phase slices are 256-lane-aligned column blocks;
  * row interleave (even/odd pooled rows) = a leading-dims reshape
    (28,2,28,256) -> (56,28,256), free on TPU (leading dims are untiled);
  * col interleave = 64-lane concat making channels (e, k), whose flat
    order IS the interleaved column order: the final
    (N,56,28,128) -> (N,56,56,64) reshape outside the kernel is row-major
    trivial (28*128 == 56*64).

Mosaic constraints honoured (see CLAUDE.md): int8 maxsi does not legalize
-> maxes run in int32; concat operands must share lane offsets -> borders
are built by padding the whole array at offset 0 and re-slicing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(x_ref, out_ref):
    # int8 maxsi fails to legalize in Mosaic (cf. int16 add) -> max in int32
    x = x_ref[0].astype(jnp.int32)                 # (28, 28, 1024)
    py = lambda p: jax.lax.slice(x, (0, 0, p * 256), (28, 28, (p + 1) * 256))
    # virtual row 4t-1 = phase-3 slice of folded row t-1; pad one -128 row on
    # the leading (untiled) axis then slice, so the concat operands share
    # lane offset 0 (Mosaic rejects offset-mismatched concats)
    xp = jnp.concatenate([jnp.full((1, 28, 1024), -128, jnp.int32), x],
                         axis=0)
    prev3 = jax.lax.slice(xp, (0, 0, 768), (28, 28, 1024))
    re = jnp.maximum(jnp.maximum(prev3, py(0)), py(1))   # pooled rows 2t
    ro = jnp.maximum(jnp.maximum(py(1), py(2)), py(3))   # pooled rows 2t+1
    # interleave rows: (28,2,28,256) -> (56,28,256) leading reshape (free)
    rows = jnp.stack([re, ro], axis=1).reshape(56, 28, 256)
    cb = lambda p: jax.lax.slice(rows, (0, 0, p * 64), (56, 28, (p + 1) * 64))
    rp = jnp.concatenate([jnp.full((56, 1, 256), -128, jnp.int32), rows],
                         axis=1)
    prev3c = jax.lax.slice(rp, (0, 0, 192), (56, 28, 256))
    ce = jnp.maximum(jnp.maximum(prev3c, cb(0)), cb(1))  # pooled cols 2q
    co = jnp.maximum(jnp.maximum(cb(1), cb(2)), cb(3))   # pooled cols 2q+1
    # channels become (e, k): flat row-major == interleaved columns
    out_ref[0] = jnp.concatenate([ce, co], axis=2).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pool_stem_phases(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(N, 28, 28, 1024) int8 s2d stem-conv output -> (N, 56, 56, 64) int8.

    Equals max_pool(3,3)/s2/p1 of the depth-to-space (N,112,112,64) image.
    """
    n, h, w, c = x.shape
    assert (h, w, c) == (28, 28, 1024), "specialized to the 8x8-fold stem"
    out = pl.pallas_call(
        _pool_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 28, 28, 1024), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 56, 28, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 56, 28, 128), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x)
    return out.reshape(n, 56, 56, 64)
