"""Persistent XLA compilation cache.

The axon-tunnel TPU backend compiles the full-granule pipeline at
minutes-scale latency (41–210 s measured for the fused program's
warm-up); JAX's persistent compilation cache eliminates that on every
repeat invocation — measured 0.69 s → 0.10 s across processes for a
representative program on this backend. ``enable_compilation_cache()``
is called by ``bench.py`` and the CLI; library users opt in the same
way (or via the standard JAX env vars).

Set ``HYPERRES_COMPILE_CACHE=0`` to disable, or
``HYPERRES_COMPILE_CACHE_DIR`` to relocate it.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Union


def enable_compilation_cache(
        cache_dir: Union[str, Path, None] = None) -> Optional[Path]:
    """Point JAX's persistent compilation cache at a durable directory.

    Must run before the first compilation (any time before is fine —
    unlike platform selection it does not require pre-backend-init).
    Returns the cache dir, or None when disabled via
    ``HYPERRES_COMPILE_CACHE=0``."""
    if os.environ.get("HYPERRES_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    # default location: INSIDE the repo checkout (survives environment /
    # container recreation, which the home cache demonstrably does not),
    # falling back to the home cache for installed (non-checkout) uses.
    # A checkout is detected by a repo marker two levels above the
    # package (.git or pyproject.toml) — the package directory itself
    # always exists, so it can't distinguish site-packages installs.
    repo_root = Path(__file__).resolve().parents[2]
    if (repo_root / ".git").exists() or (repo_root / "pyproject.toml").exists():
        default = repo_root / ".jaxcache"
    else:
        default = Path.home() / ".cache" / "hyperres" / "jaxcache"
    d = Path(cache_dir
             or os.environ.get("HYPERRES_COMPILE_CACHE_DIR")
             or default)
    try:
        d.mkdir(parents=True, exist_ok=True)
    except OSError:
        # non-writable location (system install): degrade to no
        # persistent cache rather than crashing the caller
        return None
    jax.config.update("jax_compilation_cache_dir", str(d))
    # cache EVERY program, whatever its size or compile time: with the
    # 1.0 s default, the pipeline's small helper programs (probes,
    # quantizers, scalar reductions) recompile on every process start
    # AND make a warm run indistinguishable from a cold one in the
    # cache-hit telemetry bench.py reports (hits stay < requests
    # forever because sub-second entries are never written)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
