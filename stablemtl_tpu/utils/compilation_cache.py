"""Persistent XLA compilation cache.

The UNet train/infer graphs are large (3 UNet bodies per train step); a cold
XLA compile takes minutes on CPU and tens of seconds on TPU. Enabling JAX's
persistent compilation cache makes every subsequent process start hit the
disk cache instead — standard practice for production TPU training loops.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "STABLEMTL_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the on-disk compilation cache. Returns the dir.

    Also honors the JAX_PLATFORMS env var, which this environment's
    sitecustomize otherwise overrides via jax.config (so e.g.
    JAX_PLATFORMS=cpu works for CLI entry points too)."""
    global _enabled
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _enabled = True
    return cache_dir
