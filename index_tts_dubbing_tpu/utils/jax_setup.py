"""Process-level JAX runtime setup.

Enables the persistent XLA compilation cache (critical on this TPU backend,
where large-graph compiles take minutes but cache hits are instant across
processes) unless the user configured one already.
"""
from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # The default "xla_gpu_per_fusion_autotune_cache_dir" feature writes the
    # CACHE DIR PATH into debug_options — which is hashed into the
    # compilation-cache key, so entries compiled against one cache dir can
    # never hit from another (this broke snapshot-from-a-temp-dir seeding,
    # root-caused r04). It is a GPU-only autotune feature, irrelevant on
    # TPU — disable it so keys are cache-dir-independent. This must run
    # even when the cache dir was already configured via the env var (the
    # early return below).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        current = None
    if current:
        return
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or str(Path.home() / ".cache" / "jax_comp_cache"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even small/fast-compiling programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
