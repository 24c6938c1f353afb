"""Persistent XLA compilation cache.

The fused device programs (SCM/CART sweeps, the exact-engine fused step)
compile in seconds on a direct-attached chip but minutes through a
tunneled/queued compile service — and the reference never pays an analogous
cost (its C kernels are pre-built). Enabling JAX's persistent compilation
cache makes every process after the first start at full speed: compiled
executables are keyed by (program, compile options, device kind) and
reloaded from disk in milliseconds.

Called from the CLI entry point and ``bench.py``; safe to call multiple
times and before/after backend initialization (JAX picks the config up on
first compile).
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "grm_tpu", "xla"
)


def enable_compilation_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, ``GRM_COMPILE_CACHE`` env var,
    JAX's own ``JAX_COMPILATION_CACHE_DIR`` env var, ``~/.cache/grm_tpu/xla``.
    ``GRM_COMPILE_CACHE=0`` disables the cache even when the caller passes
    an explicit directory (bench.py does), so the env kill-switch always
    works. Returns the directory in use, or None when disabled/unavailable.
    """
    if os.environ.get("GRM_COMPILE_CACHE", "").lower() in ("0", "off", "none"):
        return None
    if cache_dir is None:
        cache_dir = (os.environ.get("GRM_COMPILE_CACHE")
                     or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or _DEFAULT_DIR)
    if str(cache_dir).lower() in ("0", "off", "none"):
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        # An unwritable cache directory is a real misconfiguration — say so
        # (but keep running uncached) instead of silently swallowing it.
        import logging

        logging.getLogger(__name__).warning(
            "compilation cache disabled: cannot create %s (%s)", cache_dir, e
        )
        return None
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Cache everything that took noticeable compile time; the sweeps
        # are few and large, so the cache stays small (tens of MB).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return str(cache_dir)
    except Exception:  # pragma: no cover - old jax without the knobs
        return None
