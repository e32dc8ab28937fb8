"""Persistent XLA compilation-cache location.

Fused-program compiles over the accelerator tunnel cost minutes; the
compilation cache is what makes bench/test walls tolerable. ``/tmp`` does
NOT survive the container restarts between sessions, but the repo
checkout does — so the cache lives inside the repo (untracked, see
.gitignore) and a fresh session (or the driver's end-of-round bench)
finds warm programs instead of recompiling everything.
"""

from __future__ import annotations

import os


def jit_cache_dir() -> str:
    """A writable persistent cache directory (repo-local), or the
    classic /tmp/jax_cache when the package location is not writable."""
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".write-probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return path
    except OSError:
        return "/tmp/jax_cache"


def configure(jax) -> str:
    """Point jax's persistent compilation cache at jit_cache_dir()."""
    d = jit_cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
