"""Test config: run everything on a fake 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py, never in tests. Env vars must be set
before jax initializes, hence here at conftest import time.
"""

import os

# Hard override: the session env pre-sets JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on local CPU with fake devices.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: interpret-mode Pallas compiles are slow (~1min)
# but fully cacheable across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# This JAX build defaults f32 matmuls to bf16 MXU passes (TPU convention) even
# on CPU; parity oracles need true f32 matmuls.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon sitecustomize force-registers the tunneled TPU regardless of
# JAX_PLATFORMS; the config knob wins. Tests must run on local CPU.
jax.config.update("jax_platforms", "cpu")
