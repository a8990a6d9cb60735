"""Roofline model: % of speed-of-light for quantized kernels on TPU.

The reference reports raw ms vs cuDNN (check.cu:150-154). The BASELINE
target is expressed as % of int8 MXU speed-of-light, so every kernel bench
here reports measured time against the max(compute-limit, bandwidth-limit)
estimate — the roofline.

Chip peaks default to TPU v5e (the chip in this environment; PALLAS_AXON_TPU_GEN=v5e):
  int8 MXU ~394.5 TOPS, bf16 ~197 TFLOPS, HBM ~819 GB/s.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    int8_tops: float       # peak int8 tera-ops (2*MAC counted)
    bf16_tflops: float
    hbm_gbps: float        # HBM bandwidth GB/s


V5E = ChipSpec("tpu_v5e", int8_tops=394.5, bf16_tflops=197.0, hbm_gbps=819.0)
V5P = ChipSpec("tpu_v5p", int8_tops=918.0, bf16_tflops=459.0, hbm_gbps=2765.0)

CHIPS = {"v5e": V5E, "v5p": V5P}


def detect_chip() -> ChipSpec:
    import os

    return CHIPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"), V5E)


@dataclass
class KernelCost:
    flops: int             # total ops (2 * MACs)
    bytes_in: int
    bytes_out: int

    @property
    def bytes(self) -> int:
        return self.bytes_in + self.bytes_out


def matmul_cost(m: int, k: int, n: int, a_bytes=1, b_bytes=1, out_bytes=4
                ) -> KernelCost:
    # byte widths may be fractional (e.g. 0.5 for nibble-packed int4)
    return KernelCost(
        flops=2 * m * k * n,
        bytes_in=int(m * k * a_bytes + k * n * b_bytes),
        bytes_out=int(m * n * out_bytes),
    )


def conv_cost(n, oh, ow, kh, kw, cin, cout, in_h, in_w,
              a_bytes=1, w_bytes=1, out_bytes=4) -> KernelCost:
    return KernelCost(
        flops=2 * n * oh * ow * kh * kw * cin * cout,
        bytes_in=n * in_h * in_w * cin * a_bytes + kh * kw * cin * cout * w_bytes,
        bytes_out=n * oh * ow * cout * out_bytes,
    )


def speed_of_light_s(cost: KernelCost, chip: ChipSpec, dtype: str = "int8"
                     ) -> float:
    """Lower-bound runtime: max(compute-bound, bandwidth-bound)."""
    peak = chip.int8_tops if dtype == "int8" else chip.bf16_tflops
    t_compute = cost.flops / (peak * 1e12)
    t_memory = cost.bytes / (chip.hbm_gbps * 1e9)
    return max(t_compute, t_memory)


def roofline_pct(measured_s: float, cost: KernelCost, chip: ChipSpec,
                 dtype: str = "int8") -> float:
    return 100.0 * speed_of_light_s(cost, chip, dtype) / max(measured_s, 1e-12)
