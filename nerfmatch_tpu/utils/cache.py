"""Persistent XLA compilation cache (host-keyed), package-wide.

On the 1-core build host XLA compiles dominate wall-clock (the fused
train step alone is ~15 min cold; measured 15.5s -> 0.9s for a toy
program once cached, axon TPU backend verified).  Every CLI and heavy
script calls :func:`enable_compile_cache` so repeated runs — trainers,
evaluators, benches, probes — reuse serialized executables.

The cache directory is keyed by a digest of the host's CPU flags:
XLA:CPU AOT entries embed the compile machine's features, and loading
them on a different host spews feature-mismatch errors and risks SIGILL
(TPU entries are keyed by platform inside the cache itself).  Override
the location with ``NERFMATCH_COMPILE_CACHE=<dir>`` or disable with
``NERFMATCH_COMPILE_CACHE=0``.

The reference has no analogue (torch caches kernels in-process only);
this is TPU/XLA-native infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import platform


def host_fingerprint() -> str:
    """Digest of this machine's CPU features (isolates AOT cache entries)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    return hashlib.sha256(
        (platform.machine() + flags).encode()).hexdigest()[:12]


def default_cache_dir() -> pathlib.Path:
    """Repo-local ``.jax_cache/<host-fp>`` when running from a checkout
    (shared with the test suite), else ``~/.cache/nerfmatch_tpu/jax``."""
    repo = pathlib.Path(__file__).resolve().parents[2]
    base = (repo / ".jax_cache" if (repo / "nerfmatch_tpu").is_dir()
            else pathlib.Path.home() / ".cache" / "nerfmatch_tpu" / "jax")
    return base / host_fingerprint()


def enable_compile_cache(jax_module=None) -> pathlib.Path | None:
    """Point jax at the persistent compilation cache.  Idempotent; call
    before the first jit compile (anywhere early works)."""
    env = os.environ.get("NERFMATCH_COMPILE_CACHE", "")
    if env == "0":
        return None
    if jax_module is None:
        import jax as jax_module
    cache = pathlib.Path(env) if env else default_cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", str(cache))
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             0.1)
    return cache
