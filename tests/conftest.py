"""Test configuration: force an 8-device virtual CPU platform so every
multi-chip sharding path is exercised without TPU hardware (the standard
fake-mesh trick; the reference has no distributed path at all —
SURVEY.md §2.2)."""

import os

# Must be set before jax is imported anywhere. Plain assignment: the
# harness environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU), and
# tests must NOT run over the tunnel — every eager op would be a network
# round trip and tunnel stalls hang the suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The harness sitecustomize registers the tunneled-TPU ("axon") PJRT
# plugin in every interpreter and forces jax_platforms="axon,cpu" via
# jax.config — which overrides the env var above. Override it back: the
# test suite must run on the local CPU backend (8 virtual devices), never
# over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache for the CPU backend only: with
# jax_platforms=cpu the compiles run locally (observed llvm-worker
# threads), so cached binaries match this host. Entries produced by the
# tunneled-TPU remote-compile path would not — hence the dedicated dir.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_local")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
