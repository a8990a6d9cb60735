"""Native host-side runtime: C++ conv oracle + data pipeline (ctypes)."""

from lowbitdnn_project_tpu.runtime.native import (
    PrefetchLoader,
    load,
    pack_int4_native,
    preprocess_quantize,
    refconv2d_int8,
    unpack_int4_native,
)

__all__ = [
    "PrefetchLoader",
    "load",
    "refconv2d_int8",
    "preprocess_quantize",
    "pack_int4_native",
    "unpack_int4_native",
]
