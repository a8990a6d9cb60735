"""End-to-end INT8 serving example: native host preprocessing -> calibrated
int8-chained ResNet-50 -> logits, with a micro-batching serving loop;
optionally saves/loads the quantized checkpoint. The full deployment flow a
reference user would assemble from qtorch + cuDNN, on TPU.

The preprocessed int8 tensor is fed to the model AS INT8 (a QTensor at the
calibrated conv1 scale) — no float round-trip at the serving boundary.

Run: python examples/serve_resnet50.py
"""
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.quant.qtensor import QTensor
from lowbitdnn_project_tpu.runtime import PrefetchLoader, preprocess_quantize
from lowbitdnn_project_tpu.utils import load_quantized, save_quantized

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class MicroBatchServer:
    """Tiny production-shaped serving loop: requests land in a queue, a
    worker drains up to ``max_batch`` of them, pads to the compiled batch
    size, runs ONE int8 forward, and fans logits back out to the callers.

    The reference's serving story is "call the int8 op per request"
    (df-optimization/Int8Conv2d.py); batching is how that becomes a
    deployment on an MXU-based chip — padding to a fixed batch keeps a
    single compiled executable (no dynamic shapes under jit).
    """

    def __init__(self, infer, qparams, in_scale, max_batch=8,
                 max_wait_ms=2.0):
        self.infer = infer
        self.qparams = qparams
        self.in_scale = jnp.float32(in_scale)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, x_int8: np.ndarray) -> "queue.Queue":
        """x_int8: (224, 224, 3) int8 preprocessed image -> result queue."""
        out: "queue.Queue" = queue.Queue(1)
        self.q.put((x_int8, out))
        return out

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            xs = np.stack([b[0] for b in batch])
            pad = self.max_batch - len(batch)
            if pad:
                xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:],
                                                  xs.dtype)])
            try:
                x_q = QTensor(values=jnp.asarray(xs), scale=self.in_scale)
                logits = np.asarray(self.infer(self.qparams, x_q))
            except Exception as e:   # device hiccup: fail THESE requests,
                for _, out in batch:  # keep the worker alive for the rest
                    out.put(e)
                continue
            for (_, out), row in zip(batch, logits):
                out.put(row)

    def shutdown(self):
        self._stop.set()
        self.thread.join()

    @staticmethod
    def result(out: "queue.Queue", timeout=None):
        """Pop a result; re-raises the server-side exception if the batch
        failed (so callers never hang on a dead inference)."""
        r = out.get(timeout=timeout)
        if isinstance(r, Exception):
            raise r
        return r


def main():
    cfg = resnet.RESNET50
    print("building model (random weights; use "
          "models.convert.resnet_from_torch_state_dict for a real ckpt)...")
    params = jax.jit(lambda k: resnet.init_params(k, cfg))(jax.random.key(0))
    qparams = jax.jit(lambda p: resnet.quantize_params(p, cfg))(params)

    # calibrate on a handful of batches
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(size=(8, 224, 224, 3)), jnp.float32)
    scales = resnet.calibrate_act_scales(params, [calib], cfg)

    save_quantized("/tmp/resnet50_int8.lbq", {"qparams": qparams,
                                              "act_scales": scales})
    loaded = load_quantized("/tmp/resnet50_int8.lbq")
    qparams, scales = loaded["qparams"], loaded["act_scales"]
    print("checkpoint round-tripped: /tmp/resnet50_int8.lbq")

    # --- int4-packed checkpoint leg: W4A8 weights ship nibble-packed on
    # disk (utils/checkpoint.py packs bits==4 QTensors), halving the
    # artifact. Round-trip must be bit-exact through the pack/unpack pair.
    import os
    qp4 = jax.jit(lambda p: resnet.quantize_params(p, cfg, bits=4))(params)
    save_quantized("/tmp/resnet50_w4.lbq", {"qparams": qp4,
                                            "act_scales": scales})
    qp4_loaded = load_quantized("/tmp/resnet50_w4.lbq")["qparams"]
    for a, b in zip(jax.tree_util.tree_leaves(qp4),
                    jax.tree_util.tree_leaves(qp4_loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "int4 checkpoint round-trip not bit-exact"
    sz8 = os.path.getsize("/tmp/resnet50_int8.lbq")
    sz4 = os.path.getsize("/tmp/resnet50_w4.lbq")
    print(f"int4-packed checkpoint round-tripped bit-exact: "
          f"{sz4 / 1e6:.1f} MB vs int8 {sz8 / 1e6:.1f} MB "
          f"({sz8 / sz4:.2f}x smaller)")
    serve_w4 = True  # flip off to skip the extra W4A8 chain compile

    infer = jax.jit(lambda p, x: resnet.apply_quantized_int8chain(
        p, x, scales, cfg, backend="xla"))

    # host-side native pipeline: uint8 images -> normalized int8 NHWC
    raw = rng.integers(0, 256, (32, 224, 224, 3)).astype(np.uint8)
    in_scale = float(scales["conv1"])
    t0 = time.perf_counter()
    x_int8 = preprocess_quantize(raw, IMAGENET_MEAN, IMAGENET_STD, in_scale)
    t1 = time.perf_counter()

    # threaded prefetching variant: C++ workers preprocess the NEXT batches
    # while the device computes the current one (runtime/native.py
    # PrefetchLoader) — the steady-state throughput input stage
    with PrefetchLoader(IMAGENET_MEAN, IMAGENET_STD, in_scale,
                        n_threads=4, capacity=4) as loader:
        raw_stream = [rng.integers(0, 256, (32, 224, 224, 3)).astype(np.uint8)
                      for _ in range(4)]
        tp0 = time.perf_counter()
        for r in raw_stream:
            loader.submit(r)
        fetched = [loader.get() for _ in raw_stream]
        tp1 = time.perf_counter()
    ref0 = preprocess_quantize(raw_stream[0], IMAGENET_MEAN, IMAGENET_STD,
                               in_scale)
    assert np.array_equal(fetched[0], ref0)
    print(f"prefetch loader: 4x32 imgs in {1000 * (tp1 - tp0):.1f} ms "
          f"(4 C++ threads, FIFO, backpressured)")
    # int8 feeds the chain directly as a QTensor — no float round-trip
    x_q = QTensor(values=jnp.asarray(x_int8), scale=jnp.float32(in_scale))
    logits = infer(qparams, x_q)
    top1 = np.asarray(jnp.argmax(logits, -1))
    if serve_w4:
        # serve straight from the loaded int4 checkpoint: same chain, W4A8
        # weights (nibble-unpacked at load; values live in int8 on device)
        logits_w4 = infer(qp4_loaded, x_q)
        agree = float(np.mean(np.asarray(jnp.argmax(logits_w4, -1)) == top1))
        print(f"W4A8 serve from loaded checkpoint: top-1 agreement with "
              f"int8 = {agree:.2f} on random-init weights")
    print(f"host preprocess: {1000 * (t1 - t0):.1f} ms for 32 imgs "
          f"(C++ OpenMP)")
    print(f"logits {logits.shape}, top-1 of first 8: {top1[:8]}")

    # --- micro-batching serving loop (batch 8, 2 ms batching window) ---
    server = MicroBatchServer(infer, qparams, in_scale, max_batch=8)
    t0 = time.perf_counter()
    futures = [server.submit(np.asarray(x_int8[i])) for i in range(16)]
    rows = [MicroBatchServer.result(f, timeout=120) for f in futures]
    t1 = time.perf_counter()
    server.shutdown()
    top1_served = [int(np.argmax(r)) for r in rows]
    assert top1_served == list(top1[:16]), "served logits != direct logits"
    print(f"serving loop: 16 requests in {1000 * (t1 - t0):.1f} ms "
          f"(micro-batch 8), top-1 agrees with the direct forward")

    # --- batch-1 low-latency lane: the contiguous resident pallas chain
    # (kernels/resident_chain.py) with DMA-streamed downsample weights —
    # 99.4 us vs 117.5 classic at b1 (resident_w4a8_ab_r4.json; the plain
    # resident chain measured 103.0). A latency-tier server compiles this
    # as its single-request executable beside the batched one; the pack's
    # static ints stay out of the traced pytree (split_pack/merge_pack).
    from lowbitdnn_project_tpu.kernels.resident_chain import (
        apply_serving_resident, mark_stream, merge_pack,
        pack_resident_chain, split_pack)

    arrs, statics = split_pack(
        mark_stream(pack_resident_chain(qparams, scales, cfg)))
    infer_b1 = jax.jit(lambda p, x, a: apply_serving_resident(
        p, x, scales, cfg, merge_pack(a, statics)))
    x1 = QTensor(values=jnp.asarray(x_int8[:1]), scale=jnp.float32(in_scale))
    logits_b1 = infer_b1(qparams, x1, arrs)
    assert int(np.argmax(np.asarray(logits_b1))) == int(top1[0]), \
        "resident b1 lane disagrees with the batched chain"
    print("b1 low-latency lane (resident pallas chain): top-1 agrees "
          "with the batched chain")


if __name__ == "__main__":
    main()
