"""Per-host-keyed persistent XLA compilation cache (test-side shim).

The real implementation moved to ``nerfmatch_tpu.utils.cache`` so CLIs
and scripts share the exact fingerprint scheme (the cache must never
split between tests and production entry points).  This shim keeps the
old import path for conftest.py / multihost_worker.py, which run before
sys.path gains the repo root in some launch modes.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nerfmatch_tpu.utils.cache import (  # noqa: E402,F401
    enable_compile_cache, host_fingerprint)


def setup_compilation_cache(jax) -> None:
    enable_compile_cache(jax)
