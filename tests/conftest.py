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
# The dir is additionally keyed by a hash of the host's CPU feature set:
# XLA's cache key does NOT include machine features, and /tmp can
# outlive a VM reassignment to different silicon — a stale AOT entry
# then aborts at execution ("Target machine feature +prefer-no-scatter
# is not supported on the host machine" → SIGILL/abort, observed
# round 4 on the full-size TP step).
import hashlib  # noqa: E402

def _cpu_feature_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofeatures"

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_cpu_{_cpu_feature_tag()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
