"""Persistent XLA compilation cache.

The UNet train/infer graphs are large (3 UNet bodies per train step); a cold
XLA compile takes minutes on CPU and tens of seconds on TPU. Enabling JAX's
persistent compilation cache makes every subsequent process start hit the
disk cache instead — standard practice for production TPU training loops.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax

DEFAULT_CACHE_ROOT = os.environ.get(
    "STABLEMTL_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))

_enabled = False


def host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU ISA/features.

    CPU AOT executables embed machine-feature assumptions ("Target machine
    feature +prefer-no-gather is not supported ... could lead to execution
    errors such as SIGILL"); loading an entry compiled on a different
    machine wastes a load-fail per compile at best and executes wrong-ISA
    code at worst. Keying the cache directory by (arch, cpu flags) makes
    foreign entries invisible instead of merely rejected."""
    bits = [platform.machine(), jax.__version__]
    # Hash EVERY identifying line of the first core's cpuinfo block, not
    # just the first match: two VMs can share a "model name" string while
    # family/model/stepping differ — and XLA derives LLVM *tuning*
    # features (+prefer-no-gather etc.) from those, so a model-name-only
    # key collided across machines (observed round 3: foreign AOT entries
    # loading again with "could lead to execution errors such as SIGILL").
    keys = ("model name", "cpu family", "model", "stepping", "vendor_id",
            "flags", "Features", "CPU implementer", "CPU part")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of first core's block
                if line.split(":")[0].strip() in keys:
                    bits.append(line.strip())
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def cache_dir_for_host(root: str | None = None) -> str:
    """Per-(platform, host-ISA) cache subdirectory under the cache root."""
    return os.path.join(root or DEFAULT_CACHE_ROOT,
                        f"{platform.machine()}-{host_fingerprint()}")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the on-disk compilation cache. Returns the dir.

    The directory is keyed by host CPU fingerprint (see host_fingerprint)
    unless an explicit cache_dir is given. Also honors the JAX_PLATFORMS
    env var, which this environment's sitecustomize otherwise overrides via
    jax.config (so e.g. JAX_PLATFORMS=cpu works for CLI entry points too)."""
    global _enabled
    cache_dir = cache_dir or cache_dir_for_host()
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
