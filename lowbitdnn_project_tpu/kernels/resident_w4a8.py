"""W4A8 resident serving chain: nibble-packed weights streamed into the
weight-floor-bound stages of the batch-1 resident chain.

Round-3 decomposition of the resident chain's remaining headroom
(CLAUDE.md r3 end state): the layer4 stage (16.9 us vs a ~15 us
load+compute serialization floor for its 8.8 MB of weights) and the ds4
block (15.4 us, 5.75 MB one-shot load ~7 us + fixed) sit AT their
weight-streaming floors — the activations are tiny at b1, the weights are
the traffic. kernels/matmul_w4a8.py's in-kernel int4 unpack exists
precisely to halve that traffic; this module composes the two proven
structural wins: the deep stages (layer3/layer4 + their downsample
blocks) stream nibble-packed int4 weights (half the HBM bytes) and
sign-extend them on the VPU inside VMEM before feeding the MXU.

Numerics: W4A8 on layers 3-4 only (the weight-floor-bound stages);
layers 1-2 + stem + fc stay int8 — mixed-precision deployment, standard
for W4 serving (the shallow layers hold <15% of the weight bytes but most
of the accuracy sensitivity). Accuracy guard: the packed kernels are
BIT-IDENTICAL to the unpacked resident kernels running the same int4
values (unpack(pack(w)) == w exactly); the int4-vs-int8 accuracy delta is
the usual W4A8 trade, measured in accuracy_parity.json.

Packing reuses kernels/matmul_w4a8.py's device-proven halves-concat
layout (pack_int4_rows / _unpack_rows): within each block_k row-block,
packed row j holds rows (j, j + block_k/2) as (lo, hi) nibbles; unpack is
int32 bit ops (Mosaic cannot legalize uint8 shifts) + a sublane concat.
Per-matrix block_k choices make every in-kernel use a contiguous slice:
  w1:  block_k = Cin        (single use, halves over the full K)
  w2:  block_k = Cmid       (per-TAP halves: tap t = packed rows
                             [t*Cmid/2, (t+1)*Cmid/2) — _conv2 unpacks one
                             tap at a time, never materializing all 9)
  w2a: block_k = 2*Cmid     (per-dy vstacked (dx=0, dx=+1) pairs)
  w2b: block_k = Cmid       (per-dy dx=-1)
  w3:  block_k = Cmid
  wp:  block_k = Cin

Reference parity anchors: python/custom_forward.py:15-75 (the B1
custom-vs-vendor probe this chain generalizes), cpp/int8conv/
conv2DForward3x3Fused.cuh:41-60 (in-kernel quantize ethos — here the
in-kernel transform is the int4 sign-extension).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
    _unpack_rows as unpack_nib,
    pack_int4_rows,
)
from lowbitdnn_project_tpu.kernels.resident_chain import (
    _pack_rows, _unpack_rows as unpack_flat_rows, fold_w,
    pack_resident_chain,
)
from lowbitdnn_project_tpu.kernels.stage_resident import (
    ResidentMeta, resident_live_mask,
)

# stages (0-based: 0=layer1 .. 3=layer4) that stream packed int4 weights
W4_STAGES = (2, 3)


# ------------------------------------------------------------- w4 stage kernel

def _stage_kernel_w4(x_ref, w1_ref, w2_ref, w3_ref,
                     s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                     sc_ref, mask_ref, out_ref, carry, y1_ref,
                     *, offsets, g8, bm, cmid, nblk, meta):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        _pack_rows(carry, x_ref, meta)

    from lowbitdnn_project_tpu.kernels.resident_chain import _chunks

    w1 = unpack_nib(w1_ref[:])
    for r0, r1 in _chunks(0, meta.u):
        acc1 = jnp.dot(carry[r0:r1, :], w1,
                       preferred_element_type=jnp.int32)
        h1 = jnp.maximum(
            acc1.astype(jnp.float32) * s1_ref[0] + b1_ref[0], 0.0)
        q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[i, 0])), -127.0, 127.0)
        y1_ref[r0:r1, :] = jnp.where(mask_ref[r0:r1] != 0, q1,
                                     0.0).astype(jnp.int8)

    ch = cmid // 2
    w3 = unpack_nib(w3_ref[:])
    taps = [unpack_nib(w2_ref[t * ch:(t + 1) * ch, :])
            for t in range(9)]
    for r0, r1 in _chunks(g8, g8 + bm):
        n = r1 - r0
        acc2 = None
        for t, off in enumerate(offsets):
            d = jnp.dot(y1_ref[r0 + off:r0 + off + n, :], taps[t],
                        preferred_element_type=jnp.int32)
            acc2 = d if acc2 is None else acc2 + d
        h2 = jnp.maximum(
            acc2.astype(jnp.float32) * s2_ref[0] + b2_ref[0], 0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[i, 1])), -127.0, 127.0
                      ).astype(jnp.int8)

        acc3 = jnp.dot(y2, w3, preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * s3_ref[0] + b3_ref[0]
        identity = carry[r0:r1, :].astype(jnp.float32) * sc_ref[i, 2]
        out = jnp.maximum(h3 + identity, 0.0)
        q = jnp.clip(jnp.round(out * (1.0 / sc_ref[i, 3])), -127.0, 127.0)
        carry[r0:r1, :] = jnp.where(
            mask_ref[r0:r1, :] != 0, q, 0.0).astype(jnp.int8)

    @pl.when(i == nblk - 1)
    def _emit():
        unpack_flat_rows(out_ref, carry[:], meta)


@functools.partial(jax.jit, static_argnames=("meta", "nblk", "interpret"))
def stage_nhwc_resident_w4(
    x: jax.Array,           # (N, H, W, C) int8 NHWC
    w1p: jax.Array,         # (nblk*C/2, Cmid) uint8 nibble-packed
    w2p: jax.Array,         # (nblk*9*Cmid/2, Cmid) uint8, per-tap halves
    w3p: jax.Array,         # (nblk*Cmid/2, C) uint8
    s1, b1, s2, b2,         # (nblk, Cmid)
    s3, b3,                 # (nblk, C)
    chain_scales: jax.Array,    # (nblk, 4) [y1s, y2s, x_s, out_s]
    *,
    meta: ResidentMeta,
    nblk: int,
    interpret: bool = False,
) -> jax.Array:
    """stage_nhwc_resident with int4 nibble-packed weight streaming: each
    grid step DMAs HALF the weight bytes of the int8 twin and sign-extends
    in VMEM. Bit-identical to the int8 twin fed the same int4 values."""
    n, h, w, c = x.shape
    cmid = w1p.shape[1]
    assert cmid >= 128, "w4 stage kernel targets cmid >= 128 stages"
    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    vm = pltpu.VMEM
    kernel = functools.partial(_stage_kernel_w4, offsets=offsets, g8=g8,
                               bm=bm, cmid=cmid, nblk=nblk, meta=meta)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((n, h, w, c), lambda i: (0, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((c // 2, cmid), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((9 * cmid // 2, cmid), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((cmid // 2, c), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((meta.u, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((n, h, w, c), lambda i: (0, 0, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
        scratch_shapes=[pltpu.VMEM((meta.u, c), jnp.int8),
                        pltpu.VMEM((meta.u, cmid), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w1p, w2p, w3p,
      s1.astype(jnp.float32)[:, None], b1.astype(jnp.float32)[:, None],
      s2.astype(jnp.float32)[:, None], b2.astype(jnp.float32)[:, None],
      s3.astype(jnp.float32)[:, None], b3.astype(jnp.float32)[:, None],
      jnp.asarray(chain_scales, jnp.float32), mask)


# -------------------------------------------------------- w4 ds block kernel

def _ds_kernel_w4(xf_ref, w1_ref, w2a_ref, w2b_ref, w3_ref, wp_ref,
                  s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                  sp_ref, bp_ref, sc_ref, mask_ref, out_ref,
                  xs, h1f, qbuf,
                  g8, bm, cin, cmid, meta, out_meta):
    from lowbitdnn_project_tpu.kernels.resident_chain import _chunks

    _pack_rows(xs, xf_ref, meta)

    w1 = unpack_nib(w1_ref[:])
    for half in (0, 1):
        for r0, r1 in _chunks(0, meta.u):
            acc1 = jnp.dot(xs[r0:r1, half * cin:(half + 1) * cin], w1,
                           preferred_element_type=jnp.int32)
            h1 = jnp.maximum(
                acc1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
            q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
            h1f[r0:r1, half * cmid:(half + 1) * cmid] = jnp.where(
                mask_ref[r0:r1] != 0, q1, 0.0).astype(jnp.int8)

    ch = cmid // 2
    was = [unpack_nib(w2a_ref[t * cmid:(t + 1) * cmid, :])
           for t in range(3)]
    wbs = [unpack_nib(w2b_ref[t * ch:(t + 1) * ch, :]) for t in range(3)]
    w3 = unpack_nib(w3_ref[:])
    wp = unpack_nib(wp_ref[:])
    for r0, r1 in _chunks(g8, g8 + bm):
        n = r1 - r0
        acc2 = None
        for t, dy in enumerate((-1, 0, 1)):
            off = dy * meta.pitch
            da = jnp.dot(h1f[r0 + off:r0 + off + n, :], was[t],
                         preferred_element_type=jnp.int32)
            db = jnp.dot(h1f[r0 + off - 1:r0 + off - 1 + n, cmid:], wbs[t],
                         preferred_element_type=jnp.int32)
            d = da + db
            acc2 = d if acc2 is None else acc2 + d
        h2 = jnp.maximum(acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:],
                         0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                      ).astype(jnp.int8)

        acc3 = jnp.dot(y2, w3, preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]
        accp = jnp.dot(xs[r0:r1, :cin], wp,
                       preferred_element_type=jnp.int32)
        proj = accp.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
        out = jnp.maximum(h3 + proj, 0.0)
        qbuf[r0 - g8:r1 - g8, :] = jnp.clip(
            jnp.round(out * (1.0 / sc_ref[2])), -127.0, 127.0
        ).astype(jnp.int8)
    for img in range(out_meta.n):
        for hh in range(out_meta.h):
            r = meta.g8 + img * meta.seg + (2 * hh) * meta.pitch - g8
            out_ref[img, hh] = qbuf[r:r + out_meta.w, :]


@functools.partial(jax.jit, static_argnames=("meta", "out_meta", "interpret"))
def block_ds_resident_w4(
    xf: jax.Array,               # (N, H, W/2, 2*Cin) int8, fold_w output
    w1p: jax.Array,              # (Cin/2, Cmid) uint8
    w2ap: jax.Array,             # (3*Cmid, Cmid) uint8: per-dy packed pairs
    w2bp: jax.Array,             # (3*Cmid/2, Cmid) uint8
    w3p: jax.Array,              # (Cmid/2, Cout) uint8
    wpp: jax.Array,              # (Cin/2, Cout) uint8
    s1, b1, s2, b2, s3, b3, sp, bp,
    chain_scales: jax.Array,     # (3,) [y1s, y2s, out_s]
    *,
    meta: ResidentMeta,          # FOLDED geometry: (n, h, w//2)
    out_meta: ResidentMeta,      # output geometry: (n, h//2, w//2)
    interpret: bool = False,
) -> jax.Array:
    """block_ds_resident with nibble-packed int4 weight streaming — the
    5.75 MB one-shot ds4 load becomes 2.9 MB."""
    n, h, w2v, cin2 = xf.shape
    cin = cin2 // 2
    cmid = w2ap.shape[1]
    cout = w3p.shape[1]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_ds_kernel_w4, g8=g8, bm=bm, cin=cin,
                               cmid=cmid, meta=meta, out_meta=out_meta)
    scratch = [pltpu.VMEM((meta.u, 2 * cin), jnp.int8),
               pltpu.VMEM((meta.u, 2 * cmid), jnp.int8),
               pltpu.VMEM((bm, cout), jnp.int8)]
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 14 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(
            (out_meta.n, out_meta.h, out_meta.w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xf, w1p, w2ap, w2bp, w3p, wpp, s1, b1, s2, b2, s3, b3, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(3), mask)


# ------------------------------------------------------------------- packing

def mixed_w4_qparams(params: Dict[str, Any], cfg,
                     w4_stages=W4_STAGES) -> Dict[str, Any]:
    """Quantize float params mixed-precision: int4 weights on the
    weight-floor-bound stages (default layers 3-4, downsamples included),
    int8 everywhere else (stem, layers 1-2, fc)."""
    from lowbitdnn_project_tpu.models import resnet

    qp = resnet.quantize_params(params, cfg, bits=8)
    qp4 = resnet.quantize_params(params, cfg, bits=4)
    for st in w4_stages:
        qp[f"layer{st + 1}"] = qp4[f"layer{st + 1}"]
    return qp


def _pack_entry_w4(e: Dict[str, Any]) -> Dict[str, Any]:
    """Nibble-pack one stride-2 ds entry of a resident-chain pack."""
    cmid = e["w3"].shape[0]
    cin = e["w1"].shape[0]
    return dict(
        e, w4=True,
        w1=pack_int4_rows(e["w1"], block_k=cin),
        w2a=pack_int4_rows(e["w2a"], block_k=2 * cmid),
        w2b=pack_int4_rows(e["w2b"], block_k=cmid),
        w3=pack_int4_rows(e["w3"], block_k=cmid),
        wp=pack_int4_rows(e["wp"], block_k=cin),
    )


def _pack_stage_w4(sp: Dict[str, Any], c: int) -> Dict[str, Any]:
    cmid = sp["w1"].shape[1]
    return dict(
        sp, w4=True,
        w1=pack_int4_rows(sp["w1"], block_k=c),
        w2=pack_int4_rows(sp["w2"], block_k=cmid),
        w3=pack_int4_rows(sp["w3"], block_k=cmid),
    )


def pack_resident_chain_w4(qparams: Dict[str, Any],
                           act_scales: Dict[str, jax.Array], cfg,
                           w4_stages=W4_STAGES) -> Dict:
    """pack_resident_chain, then nibble-pack the ``w4_stages`` stage runs
    and their downsample entries. ``qparams`` should come from
    mixed_w4_qparams (int4 values on those stages) — packing int8 values
    would silently truncate to nibbles."""
    for st in w4_stages:
        for blk in qparams[f"layer{st + 1}"]:
            for k in ("conv1", "conv2", "conv3", "downsample"):
                if k in blk and blk[k].weight.bits != 4:
                    raise ValueError(
                        f"layer{st + 1} {k} is {blk[k].weight.bits}-bit; "
                        "w4 packing needs int4 values (mixed_w4_qparams)")
    pack = pack_resident_chain(qparams, act_scales, cfg)
    for st in w4_stages:
        if st == 0:
            raise ValueError("layer1 runs folded; w4 packing unsupported")
        pack["entry"][st] = _pack_entry_w4(pack["entry"][st])
        sp = pack["stages"].get(st)
        if sp is not None and sp["nblk"] > 0:
            pack["stages"][st] = _pack_stage_w4(sp, sp["w3"].shape[1])
    return pack


# ------------------------------------------------------------ orchestration

def apply_serving_resident_w4(qparams: Dict[str, Any], x, act_scales,
                              cfg, pack: Optional[Dict] = None, *,
                              interpret: bool = False) -> jax.Array:
    """Batch-1-class serving forward, W4A8 on the deep stages: same
    contiguous pallas region as apply_serving_resident, but the packed
    stages stream half the weight bytes."""
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        _resident_head, run_resident_stages)
    from lowbitdnn_project_tpu.kernels.stem_fused import stem_conv_pool_fused
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor

    s = act_scales
    if pack is None:
        pack = pack_resident_chain_w4(qparams, s, cfg)

    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["conv1"])
    x_q = stem_conv_pool_fused(x_q, qparams["conv1"].weight,
                               qparams["conv1"].bias,
                               s["layer1.0.conv1"], relu=True, version=3,
                               interpret=interpret)

    vals, out_scale = run_resident_stages(
        fold_w(x_q.values), True, pack, start_stage=0, interpret=interpret)
    return _resident_head(qparams, vals, out_scale, s, interpret=interpret)


ENTRY_STATIC_W4 = ("stride", "cin", "cmid", "cout", "w4", "stream")
STAGE_STATIC_W4 = ("nblk", "first", "folded", "w4")


def split_pack_w4(pack):
    """split_pack twin that also keeps the w4 routing flags static."""
    arrs = {"entry": [{k: v for k, v in e.items()
                       if k not in ENTRY_STATIC_W4}
                      for e in pack["entry"]],
            "stages": {st: {k: v for k, v in p.items()
                            if k not in STAGE_STATIC_W4}
                       for st, p in pack["stages"].items()}}
    statics = {"entry": [{k: e[k] for k in ENTRY_STATIC_W4 if k in e}
                         for e in pack["entry"]],
               "stages": {st: {k: p[k] for k in STAGE_STATIC_W4 if k in p}
                          for st, p in pack["stages"].items()}}
    return arrs, statics


def merge_pack_w4(arrs, statics):
    return {"entry": [dict(a, **s) for a, s in
                      zip(arrs["entry"], statics["entry"])],
            "stages": {st: dict(arrs["stages"][st], **statics["stages"][st])
                       for st in arrs["stages"]}}
