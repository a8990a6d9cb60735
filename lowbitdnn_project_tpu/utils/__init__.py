"""Utilities: device timing, quantized checkpoints."""

from lowbitdnn_project_tpu.utils.timing import (
    chain_via_scalar,
    chained_device_time,
)
from lowbitdnn_project_tpu.utils.checkpoint import (
    load_quantized,
    save_quantized,
)

__all__ = [
    "chained_device_time",
    "chain_via_scalar",
    "save_quantized",
    "load_quantized",
]
