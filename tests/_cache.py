"""Per-host-keyed persistent XLA compilation cache (shared helper).

XLA:CPU AOT entries embed the compile machine's CPU features; loading them
on a different host spews feature-mismatch errors and risks SIGILL.  A
digest of the host's CPU flags isolates each machine's entries.  Used by
tests/conftest.py and tests/multihost_worker.py — keep ONE copy of the
fingerprint scheme so the cache never splits between them.
"""

import hashlib
import pathlib
import platform


def host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    return hashlib.sha256(
        (platform.machine() + flags).encode()).hexdigest()[:12]


def setup_compilation_cache(jax) -> None:
    cache = (pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
             / host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
