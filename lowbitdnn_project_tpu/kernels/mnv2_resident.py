"""MobileNet-V2 batch-1 resident serving chain: stem -> head as one
contiguous pallas region.

Config 4 (MobileNet-V2 INT8) is the one BASELINE config that ships slower
than bf16 at batch (0.958x at b128, mobilenet_ab_r3.json) — the depthwise
convs are VPU work with a measured ceiling argument. But the b1 serving
regime is dispatch-bound (serving_bisect_r3.json: ~1.6-2.3 us per XLA op),
and MobileNet has ~52 conv ops per forward — exactly the regime where the
ResNet resident chain won (pallas_tax_r3.json: one contiguous pallas
region pays zero entry taxes, per-op dispatch disappears).

Design (mirrors kernels/resident_chain.py):
  * stem: fold_w turns the 3x3/s2 C=3 stem into static row offsets on an
    8-lane folded layout (2 taps per dy: wsa on col j, wsb on col j-1 —
    the block_ds_resident algebra at cin=3); H stride = compute at all
    folded rows, emit even rows with static picks.
  * stride-1 inverted residual: one kernel = expand 1x1 (MXU dot) ->
    depthwise 3x3 as NINE row-offset ELEMENTWISE int32 multiply-adds on
    the VPU (depthwise never had MXU work; in-kernel it also has no
    dispatch) -> project 1x1 (MXU) -> float residual add -> requant.
  * stride-2 inverted residual: input arrives fold_w'd (one free reshape);
    expand runs as ONE block-diagonal dot (2C -> 2Cmid_p lanes, no lane
    slicing); folded depthwise computes the even-parity output via
    per-lane tap rows (wa: [w(dy,1) | w(dy,2)], wb: [0 | w(dy,0)] at col
    j-1); the parity halves are summed with a 128-aligned lane slice
    (Cmid padded to a 128 multiple); project consumes the summed half.
  * head: 1x1 -> relu6 -> global mean pool inside the kernel, (N, 1280)
    f32 out; fc stays in XLA (trailing XLA after pallas pays no tax).

relu6: the upper clamp is subsumed by the requant clip at every int8 site
(calibrated post-relu6 scales satisfy 6/s >= 127 — same argument as
models/mobilenet.py apply_quantized_int8chain); the head's float output
clamps explicitly.

VMEM: the 112^2 sites would need (bm, 128+) int32 accumulators of 6-13 MB;
all dots and the dw/project phases run in static row CHUNKS (multiples of
8 rows) so transients stay ~2 MB.

Reference parity anchors: python/custom_forward.py:15-75 (B1 serving
probe), BASELINE.json config 4 (depthwise+pointwise int8).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbitdnn_project_tpu.kernels.resident_chain import (
    _pack_rows, _unpack_rows, fold_w,
)
from lowbitdnn_project_tpu.kernels.stage_resident import (
    ResidentMeta, resident_live_mask, resident_meta,
)

CHUNK = 2048  # row-chunk size for dots/dw at large spatial sites


def _round_up(v, m):
    return -(-v // m) * m


def _chunks(lo, hi, step):
    """Static [lo, hi) row chunks, every boundary 8-aligned (lo, step are)."""
    return [(r, min(r + step, hi)) for r in range(lo, hi, step)]


# ------------------------------------------------------------------- stem

def _stem_kernel(xf_ref, wsa_ref, wsb_ref, ss_ref, bs_ref, sc_ref,
                 mask_ref, out_ref, xs, qbuf,
                 *, meta: ResidentMeta, out_meta: ResidentMeta, g8, bm):
    _pack_rows(xs, xf_ref, meta)
    inv = 1.0 / sc_ref[0]
    for r0, r1 in _chunks(g8, g8 + bm, CHUNK):
        n = r1 - r0
        acc = None
        for t, dy in enumerate((-1, 0, 1)):
            off = dy * meta.pitch
            da = jnp.dot(xs[r0 + off:r0 + off + n, :], wsa_ref[t],
                         preferred_element_type=jnp.int32)
            db = jnp.dot(xs[r0 + off - 1:r0 + off - 1 + n, :], wsb_ref[t],
                         preferred_element_type=jnp.int32)
            d = da + db
            acc = d if acc is None else acc + d
        h = jnp.maximum(acc.astype(jnp.float32) * ss_ref[:] + bs_ref[:], 0.0)
        q = jnp.clip(jnp.round(h * inv), -127.0, 127.0)
        qbuf[r0 - g8:r0 - g8 + n, :] = jnp.where(
            mask_ref[r0:r1] != 0, q, 0.0).astype(jnp.int8)
    # emit even anchor rows: out (i, j) <- flat anchor row 2i
    for img in range(out_meta.n):
        for hh in range(out_meta.h):
            r = meta.g8 + img * meta.seg + (2 * hh) * meta.pitch - g8
            out_ref[img, hh] = qbuf[r:r + out_meta.w, :]


@functools.partial(jax.jit, static_argnames=("meta", "out_meta", "interpret"))
def mnv2_stem_resident(
    xf: jax.Array,          # (N, H, W/2, 8) int8: fold_w(x) lane-padded 6->8
    wsa: jax.Array,         # (3, 8, Cs): per dy [w(dy,1) rgb | w(dy,2) rgb | 0 0]
    wsb: jax.Array,         # (3, 8, Cs): per dy [0 0 0 | w(dy,0) rgb | 0 0]
    ss, bs,                 # (1, Cs) f32 epilogue
    out_scale: jax.Array,   # () f32
    *,
    meta: ResidentMeta,     # folded input geometry (n, h, w//2)
    out_meta: ResidentMeta,  # (n, h//2, w//2)
    interpret: bool = False,
) -> jax.Array:
    n, h, wv, _ = xf.shape
    cs = wsa.shape[2]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_stem_kernel, meta=meta, out_meta=out_meta,
                               g8=g8, bm=bm)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(
            (out_meta.n, out_meta.h, out_meta.w, cs), jnp.int8),
        scratch_shapes=[pltpu.VMEM((meta.u, 8), jnp.int8),
                        pltpu.VMEM((bm, cs), jnp.int8)],
        interpret=interpret,
    )(xf, wsa, wsb, ss, bs,
      jnp.asarray(out_scale, jnp.float32).reshape(1), mask)


# -------------------------------------------------------- stride-1 block

def _s1_kernel(x_ref, we_ref, wdw_ref, wp_ref,
               se_ref, be_ref, sd_ref, bd_ref, sp_ref, bp_ref,
               sc_ref, mask_ref, out_ref, xs, y1, qbuf,
               *, meta: ResidentMeta, g8, bm, has_expand, residual):
    _pack_rows(xs, x_ref, meta)
    # expand on ALL rows (dw needs the halo); mask restores zero guards
    if has_expand:
        for r0, r1 in _chunks(0, meta.u, CHUNK):
            acc1 = jnp.dot(xs[r0:r1, :], we_ref[:],
                           preferred_element_type=jnp.int32)
            h1 = jnp.maximum(
                acc1.astype(jnp.float32) * se_ref[:] + be_ref[:], 0.0)
            q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
            y1[r0:r1, :] = jnp.where(mask_ref[r0:r1] != 0, q1,
                                     0.0).astype(jnp.int8)
        src = y1
    else:
        src = xs
    offsets = tuple(dy * meta.pitch + dx
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    for r0, r1 in _chunks(g8, g8 + bm, CHUNK):
        n = r1 - r0
        acc2 = None
        for t, off in enumerate(offsets):
            d = (src[r0 + off:r0 + off + n, :].astype(jnp.int32)
                 * wdw_ref[t].astype(jnp.int32))
            acc2 = d if acc2 is None else acc2 + d
        h2 = jnp.maximum(acc2.astype(jnp.float32) * sd_ref[:] + bd_ref[:],
                         0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                      ).astype(jnp.int8)
        acc3 = jnp.dot(y2, wp_ref[:], preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
        if residual:
            h3 = h3 + xs[r0:r1, :].astype(jnp.float32) * sc_ref[2]
        q = jnp.clip(jnp.round(h3 * (1.0 / sc_ref[3])), -127.0, 127.0)
        qbuf[r0 - g8:r0 - g8 + n, :] = jnp.where(
            mask_ref[r0:r1] != 0, q, 0.0).astype(jnp.int8)
    _unpack_rows(out_ref, qbuf, meta, src_off=g8)


@functools.partial(jax.jit, static_argnames=(
    "meta", "has_expand", "residual", "interpret"))
def mnv2_block_s1_resident(
    x: jax.Array,            # (N, H, W, Cin) int8
    we: jax.Array,           # (Cin, Cmid) int8 (ignored if not has_expand)
    wdw: jax.Array,          # (9, 1, Cmid) int8 per-tap rows
    wp: jax.Array,           # (Cmid, Cout) int8
    se, be, sd, bd, sp, bp,  # (1, C*) f32 epilogue rows
    chain_scales: jax.Array,  # (4,) [s_dw_in, s_pj_in, in_scale, s_out]
    *,
    meta: ResidentMeta,
    has_expand: bool = True,
    residual: bool = False,
    interpret: bool = False,
) -> jax.Array:
    n, h, w, cin = x.shape
    cmid = wdw.shape[2]
    cout = wp.shape[1]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_s1_kernel, meta=meta, g8=g8, bm=bm,
                               has_expand=has_expand, residual=residual)
    scratch = [pltpu.VMEM((meta.u, cin), jnp.int8),
               pltpu.VMEM((meta.u, cmid), jnp.int8),
               pltpu.VMEM((bm, cout), jnp.int8)]
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 10 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, we, wdw, wp, se, be, sd, bd, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(4), mask)


# -------------------------------------------------------- stride-2 block

def _s2_kernel(xf_ref, we_ref, wa_ref, wb_ref, wp_ref,
               se_ref, be_ref, sd_ref, bd_ref, sp_ref, bp_ref,
               sc_ref, mask_ref, out_ref, xs, y1, qbuf,
               *, meta: ResidentMeta, out_meta: ResidentMeta,
               g8, bm, cmid_p):
    _pack_rows(xs, xf_ref, meta)
    for r0, r1 in _chunks(0, meta.u, CHUNK):
        acc1 = jnp.dot(xs[r0:r1, :], we_ref[:],
                       preferred_element_type=jnp.int32)
        h1 = jnp.maximum(
            acc1.astype(jnp.float32) * se_ref[:] + be_ref[:], 0.0)
        q1 = jnp.clip(jnp.round(h1 * (1.0 / sc_ref[0])), -127.0, 127.0)
        y1[r0:r1, :] = jnp.where(mask_ref[r0:r1] != 0, q1,
                                 0.0).astype(jnp.int8)
    for r0, r1 in _chunks(g8, g8 + bm, CHUNK):
        n = r1 - r0
        acc2 = None
        for t, dy in enumerate((-1, 0, 1)):
            off = dy * meta.pitch
            d = (y1[r0 + off:r0 + off + n, :].astype(jnp.int32)
                 * wa_ref[t].astype(jnp.int32))
            d = d + (y1[r0 + off - 1:r0 + off - 1 + n, :].astype(jnp.int32)
                     * wb_ref[t].astype(jnp.int32))
            acc2 = d if acc2 is None else acc2 + d
        acc2e = acc2[:, :cmid_p] + acc2[:, cmid_p:]   # 128-aligned halves
        h2 = jnp.maximum(acc2e.astype(jnp.float32) * sd_ref[:] + bd_ref[:],
                         0.0)
        y2 = jnp.clip(jnp.round(h2 * (1.0 / sc_ref[1])), -127.0, 127.0
                      ).astype(jnp.int8)
        acc3 = jnp.dot(y2, wp_ref[:], preferred_element_type=jnp.int32)
        h3 = acc3.astype(jnp.float32) * sp_ref[:] + bp_ref[:]
        q = jnp.clip(jnp.round(h3 * (1.0 / sc_ref[3])), -127.0, 127.0)
        qbuf[r0 - g8:r0 - g8 + n, :] = jnp.where(
            mask_ref[r0:r1] != 0, q, 0.0).astype(jnp.int8)
    # emit even anchor rows (H stride 2)
    for img in range(out_meta.n):
        for hh in range(out_meta.h):
            r = meta.g8 + img * meta.seg + (2 * hh) * meta.pitch - g8
            out_ref[img, hh] = qbuf[r:r + out_meta.w, :]


@functools.partial(jax.jit, static_argnames=("meta", "out_meta", "interpret"))
def mnv2_block_s2_resident(
    xf: jax.Array,           # (N, H, W/2, 2*Cin) int8, fold_w output
    we: jax.Array,           # (2*Cin, 2*Cmid_p) int8 block-diagonal expand
    wa: jax.Array,           # (3, 1, 2*Cmid_p) int8: [w(dy,1) | w(dy,2)]
    wb: jax.Array,           # (3, 1, 2*Cmid_p) int8: [0 | w(dy,0)]
    wp: jax.Array,           # (Cmid_p, Cout) int8
    se, be,                  # (1, 2*Cmid_p)
    sd, bd,                  # (1, Cmid_p)
    sp, bp,                  # (1, Cout)
    chain_scales: jax.Array,  # (4,) [s_dw_in, s_pj_in, unused, s_out]
    *,
    meta: ResidentMeta,      # folded geometry (n, h, w//2)
    out_meta: ResidentMeta,  # (n, h//2, w//2)
    interpret: bool = False,
) -> jax.Array:
    n, h, wv, cin2 = xf.shape
    cmid_p = wp.shape[0]
    cout = wp.shape[1]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_s2_kernel, meta=meta, out_meta=out_meta,
                               g8=g8, bm=bm, cmid_p=cmid_p)
    scratch = [pltpu.VMEM((meta.u, cin2), jnp.int8),
               pltpu.VMEM((meta.u, 2 * cmid_p), jnp.int8),
               pltpu.VMEM((bm, cout), jnp.int8)]
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 11 + [pl.BlockSpec(memory_space=pltpu.SMEM), full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(
            (out_meta.n, out_meta.h, out_meta.w, cout), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xf, we, wa, wb, wp, se, be, sd, bd, sp, bp,
      jnp.asarray(chain_scales, jnp.float32).reshape(4), mask)


# ------------------------------------------------------------ head + pool

def _head_kernel(x_ref, wh_ref, sh_ref, bh_ref, mask_ref, out_ref, xs,
                 *, meta: ResidentMeta, g8, bm, hw):
    _pack_rows(xs, x_ref, meta)
    acc = jnp.dot(xs[g8:g8 + bm, :], wh_ref[:],
                  preferred_element_type=jnp.int32)
    h = jnp.minimum(jnp.maximum(
        acc.astype(jnp.float32) * sh_ref[:] + bh_ref[:], 0.0), 6.0)
    h = h * mask_ref[g8:g8 + bm].astype(jnp.float32)
    for img in range(meta.n):
        seg = h[img * meta.seg:(img + 1) * meta.seg, :]
        out_ref[img:img + 1, :] = jnp.sum(seg, axis=0, keepdims=True) \
            * (1.0 / hw)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def mnv2_head_pool_resident(
    x: jax.Array,           # (N, H, W, Cin) int8
    wh: jax.Array,          # (Cin, Chead) int8
    sh, bh,                 # (1, Chead) f32
    *,
    meta: ResidentMeta,
    interpret: bool = False,
) -> jax.Array:
    """Head 1x1 + relu6 + global mean pool in one kernel -> (N, Chead) f32."""
    n, h, w, cin = x.shape
    chead = wh.shape[1]
    g8, bm = meta.g8, meta.u - 2 * meta.g8
    mask = jnp.asarray(resident_live_mask(meta))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_head_kernel, meta=meta, g8=g8, bm=bm,
                               hw=float(h * w))
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 5,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n, chead), jnp.float32),
        scratch_shapes=[pltpu.VMEM((meta.u, cin), jnp.int8)],
        interpret=interpret,
    )(x, wh, sh, bh, mask)


# ------------------------------------------------------------------ packing

def _row(v, n):
    return jnp.broadcast_to(
        jnp.asarray(v, jnp.float32).reshape(-1), (n,)).reshape(1, n)


def _pad_lanes(a, n, value=0.0):
    """Pad the last dim of a (1, C) or (K, C) array to n lanes."""
    pad = n - a.shape[-1]
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths, constant_values=value)


def _blockdiag(w):
    z = jnp.zeros_like(w)
    return jnp.concatenate([jnp.concatenate([w, z], 1),
                            jnp.concatenate([z, w], 1)], 0)


def pack_mnv2_resident(qparams: Dict[str, Any],
                       act_scales: Dict[str, jax.Array], cfg) -> Dict:
    """Precompute every kernel's arguments (call once at prepare time)."""
    from lowbitdnn_project_tpu.models.mobilenet import block_strides

    s = act_scales
    strides = block_strides(cfg)
    nblocks = len(qparams["blocks"])

    def in_site(i):
        if i < nblocks:
            blk = qparams["blocks"][i]
            return f"b{i}.expand" if "expand" in blk else f"b{i}.dw"
        return "head"

    # stem: folded-W taps at cin=3 (lanes [rgb p0 | rgb p1 | 0 0])
    wst = qparams["stem"].weight
    wv = wst.values                                   # (3, 3, 3, Cs)
    cs = wv.shape[3]
    z3 = jnp.zeros((3, cs), jnp.int8)
    z2 = jnp.zeros((2, cs), jnp.int8)
    wsa = jnp.stack([jnp.concatenate([wv[dy, 1], wv[dy, 2], z2])
                     for dy in range(3)])             # (3, 8, Cs)
    wsb = jnp.stack([jnp.concatenate([z3, wv[dy, 0], z2])
                     for dy in range(3)])
    stem = dict(wsa=wsa, wsb=wsb,
                ss=_row(s["stem"] * wst.scale_vector(), cs),
                bs=_row(qparams["stem"].bias, cs),
                out_scale=jnp.asarray(s[in_site(0)], jnp.float32))

    blocks: List[Dict[str, Any]] = []
    for i, blk in enumerate(qparams["blocks"]):
        wd = blk["dw"].weight                          # (3, 3, 1, Cmid)
        wpq = blk["project"].weight
        cmid = wd.shape[3]
        cout = wpq.shape[3]
        has_expand = "expand" in blk
        stride = strides[i]
        s_in = s[in_site(i)]
        s_dw, s_pj = s[f"b{i}.dw"], s[f"b{i}.project"]
        s_out = s[in_site(i + 1)]
        sd_vec = _row(s_dw * wd.scale_vector(), cmid)
        bd = _row(blk["dw"].bias, cmid)
        sp = _row(s_pj * wpq.scale_vector(), cout)
        bp = _row(blk["project"].bias, cout)
        if stride == 1:
            cin = blk["expand"].weight.shape[2] if has_expand else cmid
            e = dict(
                stride=1, has_expand=has_expand,
                residual=(cin == cout),
                we=(blk["expand"].weight.values[0, 0] if has_expand
                    else jnp.zeros((cin, cmid), jnp.int8)),
                wdw=wd.values[:, :, 0, :].reshape(9, 1, cmid),
                wp=wpq.values[0, 0],
                se=(_row(s_in * blk["expand"].weight.scale_vector(), cmid)
                    if has_expand else _row(1.0, cmid)),
                be=(_row(blk["expand"].bias, cmid) if has_expand
                    else _row(0.0, cmid)),
                sd=sd_vec, bd=bd, sp=sp, bp=bp,
                chain=jnp.stack([jnp.asarray(v, jnp.float32) for v in
                                 (s_dw, s_pj, s_in, s_out)]))
        else:
            if not has_expand:
                raise NotImplementedError(
                    "stride-2 t=1 block (not in the V2 config)")
            cmid_p = _round_up(cmid, 128)
            cin = blk["expand"].weight.shape[2]
            wep = _pad_lanes(blk["expand"].weight.values[0, 0], cmid_p)
            dwv = wd.values[:, :, 0, :]                # (3, 3, Cmid)
            zl = jnp.zeros((1, cmid_p), jnp.int8)

            def lane(v):
                return _pad_lanes(v.reshape(1, cmid), cmid_p)

            wa = jnp.stack([jnp.concatenate(
                [lane(dwv[dy, 1]), lane(dwv[dy, 2])], axis=1)
                for dy in range(3)])                   # (3, 1, 2*Cmid_p)
            wb = jnp.stack([jnp.concatenate([zl, lane(dwv[dy, 0])], axis=1)
                            for dy in range(3)])
            se1 = _row(s_in * blk["expand"].weight.scale_vector(), cmid)
            be1 = _row(blk["expand"].bias, cmid)
            e = dict(
                stride=2, has_expand=True, residual=False,
                we=_blockdiag(wep),
                wa=wa, wb=wb,
                wp=jnp.pad(wpq.values[0, 0],
                           ((0, cmid_p - cmid), (0, 0))),
                se=jnp.tile(_pad_lanes(se1, cmid_p, 1.0), (1, 2)),
                be=jnp.tile(_pad_lanes(be1, cmid_p), (1, 2)),
                sd=_pad_lanes(sd_vec, cmid_p, 1.0),
                bd=_pad_lanes(bd, cmid_p),
                sp=sp, bp=bp,
                chain=jnp.stack([jnp.asarray(v, jnp.float32) for v in
                                 (s_dw, s_pj, 0.0, s_out)]))
        blocks.append(e)

    whq = qparams["head"].weight
    head = dict(wh=whq.values[0, 0],
                sh=_row(s["head"] * whq.scale_vector(), whq.shape[3]),
                bh=_row(qparams["head"].bias, whq.shape[3]))
    return {"stem": stem, "blocks": blocks, "head": head}


# ------------------------------------------------------------ orchestration

def apply_mnv2_serving_resident(qparams: Dict[str, Any], x, act_scales,
                                cfg, pack: Optional[Dict] = None, *,
                                interpret: bool = False) -> jax.Array:
    """Batch-1-class MobileNet-V2 serving forward: stem -> head as one
    contiguous pallas region, fc in XLA."""
    from lowbitdnn_project_tpu.quant import quantize
    from lowbitdnn_project_tpu.quant.qtensor import QTensor
    from lowbitdnn_project_tpu.ops import qlinear

    s = act_scales
    if pack is None:
        pack = pack_mnv2_resident(qparams, s, cfg)

    x_q = x if isinstance(x, QTensor) else quantize(x, scale=s["stem"])
    xf = jnp.pad(fold_w(x_q.values), ((0, 0), (0, 0), (0, 0), (0, 2)))
    n, hf, wf, _ = xf.shape
    st = pack["stem"]
    vals = mnv2_stem_resident(
        xf, st["wsa"], st["wsb"], st["ss"], st["bs"], st["out_scale"],
        meta=resident_meta(n, hf, wf),
        out_meta=resident_meta(n, hf // 2, wf), interpret=interpret)

    for e in pack["blocks"]:
        n, h, w, _ = vals.shape
        if e["stride"] == 1:
            vals = mnv2_block_s1_resident(
                vals, e["we"], e["wdw"], e["wp"],
                e["se"], e["be"], e["sd"], e["bd"], e["sp"], e["bp"],
                e["chain"], meta=resident_meta(n, h, w),
                has_expand=e["has_expand"], residual=e["residual"],
                interpret=interpret)
        else:
            xf2 = fold_w(vals)
            vals = mnv2_block_s2_resident(
                xf2, e["we"], e["wa"], e["wb"], e["wp"],
                e["se"], e["be"], e["sd"], e["bd"], e["sp"], e["bp"],
                e["chain"], meta=resident_meta(n, h, w // 2),
                out_meta=resident_meta(n, h // 2, w // 2),
                interpret=interpret)

    n, h, w, _ = vals.shape
    hd = pack["head"]
    feat = mnv2_head_pool_resident(vals, hd["wh"], hd["sh"], hd["bh"],
                                   meta=resident_meta(n, h, w),
                                   interpret=interpret)
    f_q = quantize(feat, scale=s["fc"])
    return qlinear(f_q, qparams["fc"].weight, qparams["fc"].bias,
                   interpret=interpret)


# ---------------------------------------------- jit-boundary pack splitting

BLOCK_STATIC = ("stride", "has_expand", "residual")


def split_pack_mnv2(pack):
    arrs = {"stem": pack["stem"], "head": pack["head"],
            "blocks": [{k: v for k, v in e.items() if k not in BLOCK_STATIC}
                       for e in pack["blocks"]]}
    statics = [{k: e[k] for k in BLOCK_STATIC} for e in pack["blocks"]]
    return arrs, statics


def merge_pack_mnv2(arrs, statics):
    return {"stem": arrs["stem"], "head": arrs["head"],
            "blocks": [dict(a, **st)
                       for a, st in zip(arrs["blocks"], statics)]}
