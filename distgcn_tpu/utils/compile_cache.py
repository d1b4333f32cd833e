"""Persistent XLA compilation cache for CLI cold-starts.

The reference re-builds its TF1 graph per process (~seconds); our
equivalent cost is XLA compilation of the per-bucket programs, which on a
tunneled TPU runs ~20-40s per bucket. Enabling JAX's persistent
compilation cache amortizes that across processes: the second invocation
of any CLI driver with the same shapes starts hot.

Opt out with DISTGCN_JAX_CACHE=0; override the location with
DISTGCN_JAX_CACHE=/path/to/dir.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "distgcn_jax")


def enable_persistent_cache() -> str | None:
    """Point JAX at an on-disk compilation cache. Safe to call repeatedly.

    Returns the cache dir, or None if disabled/unsupported.
    """
    spec = os.environ.get("DISTGCN_JAX_CACHE", _DEFAULT)
    if spec in ("0", "", "off", "none"):
        return None
    import jax

    try:
        os.makedirs(spec, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", spec)
        # cache even fast compiles: CLI drivers compile dozens of small
        # per-bucket programs whose compile time is dominated by the
        # tunnel round-trip, not XLA itself
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return spec
