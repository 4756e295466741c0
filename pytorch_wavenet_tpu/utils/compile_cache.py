"""Persistent XLA compilation cache for the entry-point scripts.

Chaconne-class programs take 60-120 s to compile through a TPU tunnel and
every process restart pays it again (jit caches are per-process). XLA's
persistent compilation cache keys serialized executables by (HLO, compile
options, platform version) on disk, so a restarted trainer/server/bench
reloads its programs in milliseconds.

The reference has no analogue (torch 0.3 has no compile step); this is
TPU-operational plumbing. Scripts call :func:`enable_compile_cache` before
their first jit; library users opt in themselves (a library must not
mutate global jax config on import).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache and return its
    path. Resolution order: explicit ``path`` argument, the
    ``WAVENET_TPU_COMPILE_CACHE`` env var, then
    ``~/.cache/pytorch_wavenet_tpu/xla``. Set
    ``WAVENET_TPU_NO_COMPILE_CACHE=1`` to disable entirely (returns None).

    Safe to call more than once; failures (read-only filesystem, an old
    jax) degrade to no caching rather than raising."""
    if os.environ.get("WAVENET_TPU_NO_COMPILE_CACHE"):
        return None
    path = (path or os.environ.get("WAVENET_TPU_COMPILE_CACHE")
            or os.path.expanduser("~/.cache/pytorch_wavenet_tpu/xla"))
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        return None
    return path
