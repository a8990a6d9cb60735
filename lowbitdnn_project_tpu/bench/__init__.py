"""Benchmark infrastructure: roofline model, per-layer sweeps, JSON runner."""

from lowbitdnn_project_tpu.bench.roofline import (
    ChipSpec,
    V5E,
    V5P,
    conv_cost,
    detect_chip,
    matmul_cost,
    roofline_pct,
    speed_of_light_s,
)
from lowbitdnn_project_tpu.bench.harness import (
    bench_conv_layer,
    resnet50_conv_layers,
    run_resnet50_sweep,
)

__all__ = [
    "ChipSpec",
    "V5E",
    "V5P",
    "detect_chip",
    "conv_cost",
    "matmul_cost",
    "speed_of_light_s",
    "roofline_pct",
    "resnet50_conv_layers",
    "bench_conv_layer",
    "run_resnet50_sweep",
]
