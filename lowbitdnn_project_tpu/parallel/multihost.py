"""Multi-HOST data parallelism: the DP(+TP) int8 chain across a process
boundary via ``jax.distributed``.

Everything else in parallel/ is exercised on one process with 8 virtual
devices; this module proves the multi-process machinery — the DCN analogue.
Each host (process) owns its local devices; the mesh's "data" axis spans
PROCESSES (batch parallelism over DCN) while "model" (K-channel TP) stays
within a process (ICI). XLA's SPMD runtime handles the cross-process
collectives exactly as it would across real TPU hosts.

The reference is single-GPU/single-process (SURVEY.md §2, grep-verified: no
NCCL/MPI anywhere); this layer is required by SURVEY §2's "DP across hosts
over DCN".

Two entry points:
  * ``worker_main()`` — run inside each spawned process
    (``python -m lowbitdnn_project_tpu.parallel.multihost <pid> <n> <port>
    <out.npy> [local_devices]``): initializes jax.distributed, builds the
    identical model on every process (same seed), runs the TP-sharded int8
    ResNet forward with a process-spanning data axis, saves replicated
    logits.
  * ``run_multihost_demo()`` — launcher: spawns N CPU processes, plus the
    single-process reference, and asserts the logits are BIT-IDENTICAL
    (integer accumulation is associative; the float epilogues are
    elementwise, so nothing about the partition may change a single bit).

Used by tests/test_multihost.py and __graft_entry__.dryrun_multihost.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from typing import Any, Dict, Tuple

import numpy as np

BATCH = 8
SEED = 0


def _build_model():
    """Deterministic tiny int8 ResNet + calibrated scales + input batch.

    Every process builds the identical model from the same seed — the
    standard multi-host pattern (each host computes the same init, then
    device_put against the global mesh places only its addressable shards).
    """
    import jax
    import jax.numpy as jnp

    from lowbitdnn_project_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                              num_classes=16, width=16)
    params = resnet.init_params(jax.random.key(SEED), cfg)
    x = jax.random.normal(jax.random.key(SEED + 1), (BATCH, 32, 32, 3),
                          jnp.float32)
    scales = resnet.calibrate_act_scales(params, [x], cfg)
    # bake scales as python floats: jit-captured host scalars, not device
    # arrays pinned to one process's default device
    scales = {k: float(v) for k, v in scales.items()}
    qparams = resnet.quantize_params(params, cfg)
    return cfg, qparams, scales, x


def _forward(cfg, qparams, scales, x, mesh=None):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lowbitdnn_project_tpu.models import resnet

    def fn(p, xx):
        return resnet.apply_quantized_int8chain(p, xx, scales, cfg,
                                                backend="xla")

    if mesh is None:
        return np.asarray(jax.jit(fn)(qparams, x))
    # replicated output: every process can materialize the full logits
    out = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(qparams, x)
    return np.asarray(out)


def worker_main(process_id: int, num_processes: int, port: int,
                out_path: str, local_devices: int = 4) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes == 1:
        # single-process reference mode (no distributed runtime, no mesh):
        # runs in its own CPU subprocess so the launcher — whose jax may be
        # pinned to the remote-TPU platform — never compiles anything
        cfg, qparams, scales, x = _build_model()
        np.save(out_path, _forward(cfg, qparams, scales, x))
        print("[multihost reference] single-process logits saved", flush=True)
        return
    jax.distributed.initialize(f"localhost:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lowbitdnn_project_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from lowbitdnn_project_tpu.parallel.sharding import (
        shard_batch, shard_qparams_tp)

    assert jax.process_count() == num_processes
    cfg, qparams, scales, x = _build_model()

    # data axis spans PROCESSES (row p = process p's devices): DP over the
    # process boundary = DCN; model axis = TP within a process = ICI
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    dev_array = np.asarray(devs).reshape(num_processes, local_devices)
    mesh = Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))

    qp_s = shard_qparams_tp(qparams, mesh)
    x_s = shard_batch(jnp.asarray(x), mesh)
    logits = _forward(cfg, qp_s, scales, x_s, mesh=mesh)
    np.save(out_path, logits)
    print(f"[multihost worker {process_id}/{num_processes}] "
          f"devices={jax.device_count()} local={jax.local_device_count()} "
          f"logits{logits.shape} saved", flush=True)


def run_multihost_demo(num_processes: int = 2, local_devices: int = 4,
                       timeout: int = 300) -> Dict[str, Any]:
    """Spawn the workers, compute the single-process reference, assert
    bit-identical logits. Returns a result summary dict."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    tmp = tempfile.mkdtemp(prefix="lbt_multihost_")
    outs = [os.path.join(tmp, f"logits_p{i}.npy")
            for i in range(num_processes)]
    ref_out = os.path.join(tmp, "logits_ref.npy")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    # the axon sitecustomize registers (and initializes) the remote-TPU
    # PJRT plugin when this var is set — that would run before
    # jax.distributed.initialize in the worker and break it
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    def spawn(pid, nproc, out):
        return subprocess.Popen(
            [sys.executable, "-m",
             "lowbitdnn_project_tpu.parallel.multihost",
             str(pid), str(nproc), str(port), out, str(local_devices)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    procs = [spawn(i, num_processes, outs[i]) for i in range(num_processes)]
    # the single-process reference also runs as a CPU subprocess: the
    # launcher's own jax may be pinned to a (slow, remote) TPU platform
    procs.append(spawn(0, 1, ref_out))
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out.decode(errors="replace"))
            if p.returncode != 0:
                raise RuntimeError(
                    f"multihost worker failed rc={p.returncode}:\n"
                    + logs[-1][-4000:])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned — never by pattern

    per_proc = [np.load(o) for o in outs]
    ref = np.load(ref_out)

    for i, got in enumerate(per_proc):
        np.testing.assert_array_equal(
            got, ref, err_msg=f"process {i} logits != single-process")
    return {
        "num_processes": num_processes,
        "local_devices": local_devices,
        "global_devices": num_processes * local_devices,
        "logits_shape": list(ref.shape),
        "bit_identical": True,
        "logs": logs,
    }


if __name__ == "__main__":
    worker_main(process_id=int(sys.argv[1]), num_processes=int(sys.argv[2]),
                port=int(sys.argv[3]), out_path=sys.argv[4],
                local_devices=int(sys.argv[5]) if len(sys.argv) > 5 else 4)
