"""Root cause of the r4 "b8 row-chunked Mosaic remote-compile failure".

Running the partial-resident lane at b8 (start_stage=2) fails to compile.
r4 recorded it as an undiagnosed Mosaic error; the actual error (this
repro, r5) is a VMEM STACK OOM, not a compiler bug:

    Ran out of memory in memory space vmem ... for block_ds_resident
    (s8[8,14,14,1024]): scoped allocation 17.94M > 16.00M limit

At b8 the folded ds3 geometry is (8, 28, 14, 1024) -> flat U=3512 rows,
so the kernel's resident scratch alone is ~8.8 MB (xs 3512x1024 int8 +
h1f 3512x512 + qbuf ~3.4 MB) before weights (2.2 MB) and the row-chunk
int32 accumulators (CHUNK=2048 x 256 x 4 B each) — 17.9 MB total against
the v5e 16 MB VMEM. The r4 row-chunking bounded the ACCUMULATORS but not
the resident map buffers, which scale linearly with batch.

Fix would be sub-batch splitting or DMA-staging xs/h1f; moot for routing
(partial residency measured 2x SLOWER than classic at b2-b4 and is
routed off for b>=2 — partial_resident_ab_r4.json), so the kernels keep
their documented b<=4 envelope and this repro pins the reason.

Run: python -m lowbitdnn_project_tpu.bench.probes.mosaic_b8_repro [batch] [start_stage]
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from lowbitdnn_project_tpu.models import resnet                       # noqa: E402
from lowbitdnn_project_tpu.kernels.resident_chain import (            # noqa: E402
    apply_serving_partial_resident, merge_pack, pack_resident_chain,
    split_pack)

CFG = resnet.RESNET50


def main(batch=8, start=2):
    params = resnet.init_params(jax.random.key(0), CFG)
    qp8 = jax.jit(lambda: resnet.quantize_params(params, CFG, bits=8))()
    with open("/root/repo/bench_cache.json") as f:
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in json.load(f)["act_scales"].items()}
    arrs, st = split_pack(pack_resident_chain(qp8, scales, CFG))
    x = jnp.ones((batch, 224, 224, 3), jnp.float32) * 0.5
    print(f"compiling partial-resident b{batch} start_stage={start}",
          flush=True)
    try:
        out = jax.jit(lambda a: apply_serving_partial_resident(
            qp8, x, scales, CFG, merge_pack(a, st), start_stage=start))(arrs)
        out.block_until_ready()
        print("OK (no repro at this geometry)", out.shape, flush=True)
    except Exception:
        traceback.print_exc()
        print("REPRO: vmem stack OOM above (expected at b8)", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]) or (8,))
