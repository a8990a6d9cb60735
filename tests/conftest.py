"""Test harness config: force an 8-device virtual CPU mesh.

Mirrors the reference's testing posture (SURVEY.md §4) but adds what it
lacked: multi-device paths testable without real hardware. Env vars must be
set before jax initializes, hence module level in conftest.
"""
import os

# Force-override: the session environment pins JAX_PLATFORMS=axon (real TPU
# tunnel registered via sitecustomize); tests must run on the virtual CPU
# mesh regardless, and the env var alone is not enough — the axon PJRT
# plugin registration wins unless jax_platforms is set through the config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Shape sweep modeled on the reference's fixtures
# (python/qtorch/tests/conftest.py:11-42): batch x channels x spatial grid,
# scaled down for CPU interpret-mode speed.
CONV_SHAPES = [
    # (batch, in_ch, out_ch, H, W, kernel, stride, padding)
    (1, 8, 16, 6, 6, 3, 1, 1),
    (2, 16, 8, 9, 7, 3, 1, 1),
    (1, 4, 4, 8, 8, 3, 2, 1),
    (2, 8, 8, 5, 5, 1, 1, 0),
    (1, 16, 32, 7, 7, 1, 2, 0),
    (1, 8, 8, 10, 10, 5, 1, 2),
    (2, 4, 8, 8, 8, 3, 1, 0),
]


@pytest.fixture(params=CONV_SHAPES, ids=lambda s: f"b{s[0]}c{s[1]}k{s[2]}h{s[3]}w{s[4]}f{s[5]}s{s[6]}p{s[7]}")
def conv_shape(request):
    return request.param


def integer_valued(rng, shape, lo=-10, hi=10, dtype=np.float32):
    """Integer-valued float tensors — the reference's exact-match trick
    (cpp/int8conv/check.cu:69-77): values survive int8 quantization exactly,
    so quantized and float paths must agree bit-for-bit."""
    return rng.integers(lo, hi + 1, size=shape).astype(dtype)


# ---------------------------------------------------------------------------
# Quick-smoke subset: `pytest -m smoke` runs one or two fast tests per
# subsystem (<2 min total) so mid-round correctness checks stop costing the
# full ~15-minute suite (VERDICT r4 weak #6). Centralized here instead of
# decorating test files: the list IS the definition of the subset.
SMOKE_TESTS = {
    # quant core
    "tests/test_quantize.py::test_roundtrip_integer_valued_exact",
    "tests/test_quantize.py::test_per_channel_scale",
    # conv op + oracle pyramid
    "tests/test_conv.py::test_exact_match_float_vs_quantized",
    "tests/test_conv.py::test_requant_output_within_one",
    # Pallas GEMM kernel (interpret mode)
    "tests/test_matmul_int8.py::test_matmul_relu_requant_exact",
    # int8 chain e2e
    "tests/test_int8chain.py::test_int8chain_tracks_fp32",
    # model zoo / BN folding
    "tests/test_models.py::test_fold_bn_exact",
    # uint8 asymmetric path (both zp_fold modes)
    "tests/test_uint8.py::test_qconv2d_asymmetric_bias_fold",
    # winograd numerics
    "tests/test_winograd.py::test_int16_mode_bit_exact",
    # quantized backward
    "tests/test_grad.py::test_float_ste_backward_exact",
    # parallel: TP layout + collectives + SP halo + PP guards
    "tests/test_parallel.py::test_tp_weight_sharding_layout",
    "tests/test_collectives.py::test_ring_all_gather_matches_lax",
    "tests/test_spatial.py::test_sp_halo_exchange_matches_pad",
    "tests/test_pipeline.py::test_pipeline_errors",
    # checkpoint format
    "tests/test_checkpoint.py::test_mixed_tree_roundtrip",
    # native C++ runtime
    "tests/test_native.py::test_native_lib_loads",
    "tests/test_native.py::test_preprocess_quantize",
    # serving kernels: fold-w algebra + W4 pack
    "tests/test_resident_chain.py::test_fold_w_roundtrip",
    "tests/test_w4a8.py::test_pack_rows_roundtrip",
    # stem path
    "tests/test_stem.py::test_s2d_fold_shapes",
    # training extras
    "tests/test_annealing.py::test_schedules_monotone",
    # converter + profiling math
    "tests/test_convert.py::test_convert_layout_transposition",
    "tests/test_profiling.py::test_roofline_math",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: quick one-test-per-subsystem subset (<2 min)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in SMOKE_TESTS:
            item.add_marker(_pytest.mark.smoke)
