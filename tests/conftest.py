"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Rationale (SURVEY.md §4): numeric semantics tests must be fast and
deterministic; multi-chip sharding tests need >= 8 devices, which only the
virtual CPU platform provides (`--xla_force_host_platform_device_count`).
Golden parity on real TPU hardware is exercised by bench.py and the
explicit RTT_TEST_PLATFORM=axon escape hatch.

The environment may pre-register a TPU plugin (JAX_PLATFORMS=axon via
sitecustomize) before pytest starts, so setting the env var here is too
late for the default; we update jax.config before any backend is
initialized instead.
"""

import os

_want = os.environ.get("RTT_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: parity tests recompile identical programs
# across processes; this cuts re-runs from minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

if _want == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
