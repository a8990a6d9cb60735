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
