"""Test harness config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend (and pins
``JAX_PLATFORMS=axon``) in every interpreter, so jax is already imported by
the time pytest starts.  Forcing the platform through ``jax.config`` after
import still works as long as no backend has been initialized; XLA_FLAGS must
be set before the CPU client spins up.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Silence XLA:CPU's spurious AOT-cache feature-mismatch errors: the compile
# record embeds LLVM *tuning* pseudo-features (+prefer-no-gather/-scatter)
# that host detection never reports, so every warm .jax_cache load logs a
# false "could lead to SIGILL" error — even for entries this very machine
# wrote (verified: compile/host lists differ ONLY in those two).  Level 3
# drops C++ ERROR logs in tests; real failures still raise in Python.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import pathlib

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: the suite is compile-bound on a 1-CPU host
# (trainer/evaluator graphs take ~10 min cold); warm re-runs finish in a
# couple of minutes.  The cache key includes jax version + HLO, so stale
# entries are simply misses.
#
# Keyed PER HOST: the CPU AOT entries embed machine features (AVX512 etc.);
# loading a cache compiled on a different machine makes XLA's cpu_aot_loader
# spew feature-mismatch errors and risks SIGILL.  A digest of the host's CPU
# flags isolates each machine's entries.


import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache(jax)

assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"
