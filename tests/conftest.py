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

def _tpu_tunnel_healthy() -> bool:
    """Probe the axon backend in a KILLABLE subprocess: a down tunnel makes
    the first backend touch hang (or raise a libtpu mismatch) in-process,
    which used to hang the whole suite until someone knew to set
    SEID_FORCE_CPU=1.  45 s is ~2x a healthy cold device enumeration."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=45,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_force_cpu = os.environ.get("SEID_FORCE_CPU")
if _force_cpu is None and os.environ.get("PALLAS_AXON_POOL_IPS"):
    if not _tpu_tunnel_healthy():
        print(
            "[conftest] axon TPU tunnel unhealthy -> falling back to the "
            "8-device virtual CPU platform (set SEID_FORCE_CPU=0 to override)"
        )
        _force_cpu = "1"

import jax  # noqa: E402

if _force_cpu == "1":
    # When the axon TPU tunnel is down (auto-detected above, or forced via
    # SEID_FORCE_CPU=1): the axon site hook forces jax_platforms="axon,cpu"
    # at registration, but a config update BEFORE first backend init still
    # wins.  Interpret-mode tests then run fully on the host.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
