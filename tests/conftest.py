"""Test harness configuration: force CPU with 8 virtual devices.

Multi-chip sharding is tested on the standard JAX fake-multi-device CPU
harness (SURVEY.md §4): 8 virtual CPU devices stand in for a TPU slice. This
must run before any JAX backend initialization; the axon TPU plugin registered
by sitecustomize is overridden by re-selecting the cpu platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Isolate the operator disk cache per test session: JincResizer now caches
# built operators by default (api operator_cache=True), and tests must not
# share entries with the user's real cache or with previous sessions.
import tempfile  # noqa: E402

os.environ["JINCRESIZE_CACHE_DIR"] = tempfile.mkdtemp(prefix="jincresize_test_cache_")
