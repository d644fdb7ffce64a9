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
