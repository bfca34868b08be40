"""Test configuration.

Intent: an 8-device virtual CPU platform so sharding tests run anywhere
(SURVEY.md §4 'Implication for the new framework').  Reality on the axon
TPU terminal: the distribution IGNORES ``JAX_PLATFORMS=cpu`` — the default
backend stays the real TPU, so most tests exercise the COMPILED Pallas
kernels on hardware (higher fidelity, slower).  The XLA_FLAGS below still
matter: the lazily-initialized CPU client picks them up, so code that asks
for ``jax.devices("cpu")`` explicitly (parallel/mesh tests, the
dryrun_multichip re-exec child) gets its 8 virtual devices either way.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # honored off-axon; ignored on axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SEID_FORCE_CPU") == "1":
    # Escape hatch for when the axon TPU tunnel is down: the axon site hook
    # forces jax_platforms="axon,cpu" at registration, but a config update
    # BEFORE first backend init still wins.  Interpret-mode tests then run
    # fully on the host.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
