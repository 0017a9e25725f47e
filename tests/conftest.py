"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests rely on XLA's host-platform device splitting,
which has no analogue in the torch reference (see SURVEY.md §4). f64 support
is enabled so numerics tests can compare against closed forms at double
precision (the reference's tests set torch.set_default_dtype(double)).
"""

import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS to the real TPU
# tunnel, which is both slow for unit tests and lacks f64. JAX may already be
# imported by the interpreter's sitecustomize, so the env var alone is not
# enough — update the live config too (backends initialize lazily, so this
# still takes effect as long as no array op ran yet).
#
# BSI_TPU_TEST_PLATFORM=tpu opts OUT of the CPU force so the hardware-only
# tests (the `skipif(backend != "tpu")` PRNG-kernel tests) can run on a real
# chip:  BSI_TPU_TEST_PLATFORM=tpu pytest tests/test_attention_grad.py ...
# (f64 stays off on the chip; TPUs have no hardware doubles.)
_platform = os.environ.get("BSI_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

# The torch reference implementation serves as a golden oracle for parity
# tests (it is executed, never copied).
REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
