"""Pytest bootstrap: force CPU JAX with a virtual 8-device mesh.

Multi-chip sharding is validated on a host-platform device mesh (the
TPU-world equivalent of "test multi-node without a cluster" — SURVEY.md §4).
x64 is enabled so golden-value comparisons against the float64 reference can
use tight tolerances; float32 behavior is tested with explicit dtypes.

Env vars alone are not enough here: a pytest plugin may import jax before
this file's module body runs, so the config is also set programmatically
(safe as long as no backend/trace has been created yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The env vars alone don't stick on this machine: the axon TPU plugin's
# sitecustomize forces JAX_PLATFORMS=axon, and jax 0.9 ignores
# --xla_force_host_platform_device_count. Programmatic config wins.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The persistent compilation cache exists for the tunneled TPU (cold
# compiles are minutes there); under the CPU test config it buys little
# and its zstd serialize/deserialize path segfaulted twice mid-suite
# (jit_simulate_flight-sized executables, crash in
# compilation_cache.put/get_executable_and_time). Tests run cache-free;
# analyzer constructors calling enable_persistent_cache become no-ops.
jax.config.update("jax_enable_compilation_cache", False)
