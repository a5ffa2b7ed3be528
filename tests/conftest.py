"""Test configuration: force an 8-device virtual CPU mesh so sharding paths
are exercised without TPU hardware (SURVEY.md §4).

Environment subtlety: this machine's sitecustomize registers the tunneled
'axon' TPU PJRT plugin and imports jax at interpreter startup, latching
JAX_PLATFORMS=axon — so env vars are too late here. ``jax.config.update``
still works because no backend has been *initialized* yet; keeping the axon
backend out entirely is essential (its first initialization claims the TPU
through the relay and can block for minutes)."""

import os

# XLA_FLAGS is read lazily at CPU-client creation, so this still applies.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: single-core XLA:CPU compiles dominate test
# wall-time; cache them across runs. Same repo-local authority as every
# other entry point (ADVICE r3) — CPU entries are keyed by backend, so they
# coexist with the TPU entries; riding the checkout keeps test compiles
# warm across VM boots where /tmp is wiped.
import sys as _sys  # noqa: E402

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from i2v_tpu.utils.paths import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
