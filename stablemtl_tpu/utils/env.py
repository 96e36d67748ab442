"""Environment-flag parsing shared by the perf-path kill switches."""

from __future__ import annotations

import os


def env_flag(name: str, default: bool = False) -> bool:
    """Parse a boolean env var; parse, don't truth-test ("0"/"false" must
    mean False). NOTE: callers read these at TRACE time — a flag flipped
    after a jit wrapper has traced does not affect the cached executable;
    set it before building/jitting the pipeline.
    """
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")
