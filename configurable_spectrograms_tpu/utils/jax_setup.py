"""One-time JAX runtime configuration (persistent compilation cache).

Every fresh CLI process otherwise pays the full XLA compile for the render
programs (~15-40 s on this environment's remote compiler); the persistent
cache cuts a warm-cache fresh process to roughly a second.  Controlled by:

* ``CST_COMPILE_CACHE_DIR`` -- cache location (default
  ``~/.cache/configurable_spectrograms_tpu/jax``)
* ``CST_NO_COMPILE_CACHE=1`` -- disable entirely
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at the on-disk compilation cache."""
    global _done
    if _done or os.environ.get("CST_NO_COMPILE_CACHE") == "1":
        _done = True
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "CST_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "configurable_spectrograms_tpu", "jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        # Cacheless operation is always correct, just slower to start.
        pass
