"""Pytest config: run all tests on a virtual 8-device CPU mesh.

NOTE: in this environment something imports the jax/axon plugin at
interpreter startup, so env vars set here are too late for platform
selection; jax.config.update at runtime does work. XLA_FLAGS is still
read at CPU-client creation, which happens lazily, so setting it here
works as long as no test touches devices at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
# Disable the persistent compilation cache under pytest. JAX enables
# ~/.cache/jax by default; its CPU AOT entries are machine-feature
# specific, and on a host whose features differ from the baking
# machine both loading and re-serializing them can SIGILL/segfault
# (observed twice: crash in compilation_cache.put_executable_and_time
# mid-suite). CPU test compiles are fast; correctness beats cache hits.
jax.config.update("jax_enable_compilation_cache", False)
# CPU-only tests: enable x64 so numeric gradient checks are meaningful
# (library code pins float32 where it matters; TPU runs never see this).
jax.config.update("jax_enable_x64", True)
