"""Persistent XLA compilation cache, shared by every CLI entry point.

Full-size encoder compiles cost ~30 s locally and minutes over a tunneled
PJRT link; the evaluation CLIs in particular touch many static shapes
(duration-grouped batches compile one program per distinct duration, exactly
like the reference's per-group loader, pig/evaluation.py:153-155).  Caching
makes repeat runs — and the checkpoint-selection / ablation sweeps that rerun
the same shapes — skip all of it.
"""

from __future__ import annotations

import os


def apply_platform_override(env: str = "PEPPA_PLATFORM") -> None:
    """Honor PEPPA_PLATFORM=cpu|tpu|... for CLI runs.

    A site-loaded TPU plugin pins `jax_platforms` at import time, so the
    plain JAX_PLATFORMS env var is silently ignored on such hosts; this
    applies the user's choice at the jax.config level instead.  Must run
    before any backend is initialized (every CLI calls it first thing).
    Useful for CPU smoke runs on a TPU host — e.g. while the chip is busy
    with a long training job.
    """
    plat = os.environ.get(env)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_persistent_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compile cache (idempotent, best-effort).

    Honors JAX_COMPILATION_CACHE_DIR; defaults to ~/.cache/peppa_jax.
    """
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/peppa_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older/newer jax without these options: run uncached
        pass
