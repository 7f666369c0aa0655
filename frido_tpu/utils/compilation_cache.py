"""Persistent XLA compilation cache for the CLI entry points.

The flagship sampler (2 stages x 200 PLMS steps x CFG + decode in one XLA
program) takes on the order of ten minutes to compile cold on the TPU
backend; the persistent cache makes every later process launch with the
same shapes resume in seconds. The reference has no analogue — torch eager
has no compile step to cache.

Enabled by default from ``main.py``, ``scripts/sample_diffusion.py`` and
``bench.py``; opt out with ``FRIDO_COMPILATION_CACHE=0`` or point
``FRIDO_COMPILATION_CACHE_DIR`` somewhere other than
``~/.cache/frido_tpu/xla``. Backends that cannot serialize executables
(some remote PJRT plugins) simply miss the cache — jax degrades to a
normal compile, so this is always safe to call.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> bool:
    """Turn on jax's persistent compilation cache. Returns True if enabled."""
    if os.environ.get("FRIDO_COMPILATION_CACHE", "1") in ("0", "false", ""):
        return False
    cache_dir = (cache_dir
                 or os.environ.get("FRIDO_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/frido_tpu/xla"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even small programs; the default 1s autotune floor would
        # skip most of the helper jits around the big sampler program
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 — cache is best-effort by design
        return False
