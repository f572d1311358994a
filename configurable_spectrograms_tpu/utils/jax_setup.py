"""One-time JAX runtime configuration (persistent compilation cache).

Every fresh CLI process otherwise pays the full XLA compile for the render
programs (~15-40 s on this environment's remote compiler); the persistent
cache cuts a warm-cache fresh process to roughly a second.  Controlled by:

* ``CST_COMPILE_CACHE_DIR`` -- cache location (default
  ``~/.cache/configurable_spectrograms_tpu/jax``)
* ``CST_NO_COMPILE_CACHE=1`` -- disable entirely
* ``CST_COMPILE_CACHE_NO_FINGERPRINT=1`` -- use the directory as given

The cache directory is namespaced by a MACHINE FINGERPRINT (CPU
architecture + ISA feature flags + JAX version): XLA:CPU AOT results
compiled on one host are loaded verbatim on another sharing the same
cache path, and a feature-set mismatch is at best a loader warning spam
and at worst a SIGILL at execute time (observed: MULTICHIP_r04's dryrun
tail full of "Machine type used for XLA:CPU compilation doesn't match"
from a cache seeded on a different box).  Distinct fingerprints get
distinct subdirectories, so a mismatched AOT artifact is never even
opened.
"""

from __future__ import annotations

import os

_done = False


def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU architecture + ISA features.

    Uses ``/proc/cpuinfo``'s flags line (Linux; the deploy target) plus
    ``platform.machine()`` and the JAX version -- anything that changes
    XLA:CPU AOT code generation or cache format.  Hash-stable across
    processes on the same host, different across hosts with different
    vector ISAs.
    """
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:  # pragma: no cover - non-Linux
        parts.append(platform.processor() or "unknown")
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:  # pragma: no cover - defensive
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _cpu_backend_selected() -> bool:
    """True when this process is pinned to the XLA:CPU backend.

    XLA:CPU persists AOT machine code whose compile-time feature string
    includes tuning pseudo-features (``+prefer-no-scatter`` /
    ``+prefer-no-gather``) that the host-feature detector never reports,
    so EVERY warm cache load on CPU spams "machine type doesn't match /
    could lead to SIGILL" loader errors -- even for a cache this same
    machine wrote (verified: a second ``dryrun_multichip`` run over a
    fingerprint-fresh cache reproduces them).  CPU compiles are local
    LLVM and fast; the persistent cache's value is the remote TPU
    compiler (~15-40 s per program), so CPU processes simply skip it.
    """
    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if env == "cpu":
        return True
    try:
        import jax

        cfg = getattr(jax.config, "jax_platforms", None)
        return (cfg or "").strip().lower() == "cpu"
    except Exception:  # pragma: no cover - defensive
        return False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at the on-disk compilation cache."""
    global _done
    if _done or os.environ.get("CST_NO_COMPILE_CACHE") == "1":
        _done = True
        return
    _done = True
    if _cpu_backend_selected():
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "CST_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "configurable_spectrograms_tpu", "jax"),
        )
        # Machine-feature namespacing (see module docstring): an explicit
        # CST_COMPILE_CACHE_DIR is honored as given only with
        # CST_COMPILE_CACHE_NO_FINGERPRINT=1; by default every path gains
        # the fingerprint leaf so shared/NFS cache roots stay safe.
        if os.environ.get("CST_COMPILE_CACHE_NO_FINGERPRINT") != "1":
            cache_dir = os.path.join(cache_dir, machine_fingerprint())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        # Cacheless operation is always correct, just slower to start.
        pass
