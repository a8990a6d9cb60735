"""Mini-chain probe: bottleneck triple (c1 1x1 A->64, c2 3x3 64->64,
c3 1x1 64->B) classic vs fully-packed — where c1/c3 absorb the pack/unpack.

packed scheme (all int8, requant between):
  c1p: conv(x, (1,2,A,128) block kernel, stride (1,2), wpad (1,1))
       -> (B,H,W/2+1,128) odd-even packed; border half-cols masked to 0.
  c2p: conv(., (3,2,128,128) wpack kernel, pad ((1,1),(0,0)))
       -> (B,H,W/2,128) even-odd packed.
  c3p: conv(., (1,1,128,2Co)) block-diag -> reshape (B,H,W,Co).
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lowbitdnn_project_tpu.utils.timing import chained_device_time, chain_via_scalar
from lowbitdnn_project_tpu.ops.wpack import (
    pack_entry_1x1_weights, pack_exit_1x1_weights, pack_wpair_weights)

DN = ("NHWC", "HWIO", "NHWC")


def rq(acc, s, relu=True):
    y = acc.astype(jnp.float32) * s
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * 64.0), -127, 127).astype(jnp.int8)


def conv(x, w, stride=(1, 1), pad=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w, stride, pad, dimension_numbers=DN,
        preferred_element_type=jnp.int32)


def classic_triple(x, w1, w2, w3):
    h1 = rq(conv(x, w1), 0.001)
    h2 = rq(conv(h1, w2, pad=((1, 1), (1, 1))), 0.001)
    return rq(conv(h2, w3), 0.001, relu=False)


# entry/exit pack helpers come from ops.wpack so this probe keeps
# measuring the SHIPPED layouts (it is the committed A/B evidence)
pack_c1 = pack_entry_1x1_weights
pack_c3 = pack_exit_1x1_weights


def packed_triple(x, w1p, w2p, w3p, mask):
    n, h, wdim, _ = x.shape
    h1 = conv(x, w1p, stride=(1, 2), pad=((0, 0), (1, 1)))
    h1 = rq(h1, 0.001) * mask                       # (n,h,wdim//2+1,128)
    h2 = rq(conv(h1, w2p, pad=((1, 1), (0, 0))), 0.001)
    out = rq(conv(h2, w3p), 0.001, relu=False)      # (n,h,wdim//2,2B)
    return out.reshape(n, h, wdim, -1)


def main():
    rng = np.random.default_rng(0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B, H, W, A, C, Co = batch, 56, 56, 256, 64, 256
    x = jnp.asarray(rng.integers(-100, 100, (B, H, W, A)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-8, 8, (1, 1, A, C)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-8, 8, (3, 3, C, C)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-8, 8, (1, 1, C, Co)), jnp.int8)
    w1p, w3p = pack_c1(w1), pack_c3(w3)
    w2p = pack_wpair_weights(w2)
    mask = np.ones((W // 2 + 1, 2 * C), np.int8)
    mask[0, :C] = 0
    mask[W // 2, C:] = 0
    mask = jnp.asarray(mask)

    y0 = np.asarray(classic_triple(x, w1, w2, w3))
    y1 = np.asarray(packed_triple(x, w1p, w2p, w3p, mask))
    print("bit-exact:", np.array_equal(y0, y1))
    assert np.array_equal(y0, y1)

    best = {}
    for _ in range(2):
        for name, step, args in (
            ("classic", lambda c, *a: chain_via_scalar(
                c, classic_triple(c, *a)), (w1, w2, w3)),
            ("packed", lambda c, *a: chain_via_scalar(
                c, packed_triple(c, *a)), (w1p, w2p, w3p, mask)),
        ):
            t = chained_device_time(step, x, lo=20, hi=220, args=args)
            best[name] = min(best.get(name, 1e9), t)
    macs = B * H * W * (A * C + 9 * C * C + C * Co)
    for k, t in best.items():
        print(f"b{batch} {k:8s}: {t*1e6:8.1f} us  "
              f"{2*macs/t/1e12:6.1f} useful TOPS")
    print(f"speedup: {best['classic']/best['packed']:.3f}x")


if __name__ == "__main__":
    main()
