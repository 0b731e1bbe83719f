"""Persistent XLA compilation-cache helper.

Round-1 finding (docs/NEXT_ROUND.md item 10): ``.jax_cache`` never
populated through the remote compile service, so every fresh process paid
the full 1-5 minute compile.  Root cause: the tunneled backend compiles in
a remote service, so JAX's *local* compile-time measurement is ~0 seconds
and the default ``jax_persistent_cache_min_compile_time_secs = 1.0``
rejected every entry.  Forcing both persistence thresholds to zero makes
the cache work: measured 224.7 s cold -> 20.8 s warm start for a toy jit
on the tunneled v5e (2026-08-16).
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.expanduser("~/.cache/cara_tpu_xla")


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Enable the persistent compilation cache (idempotent); returns dir.

    Resolution order: explicit ``path`` > ``$CARA_JIT_CACHE`` >
    ``~/.cache/cara_tpu_xla``.  Set ``CARA_JIT_CACHE=0`` to disable.
    """
    import jax

    env = os.environ.get("CARA_JIT_CACHE")
    if path is None and env == "0":
        return ""
    explicit = path is not None or bool(env)
    path = path or env or DEFAULT_DIR
    if not explicit and jax.default_backend() == "cpu":
        # XLA:CPU cache entries are AOT-compiled for the *writing* host's
        # exact ISA feature set; a shared default cache dir can hand a
        # different host a binary it warns "could lead to execution errors
        # such as SIGILL" about.  CPU compiles of this workload are cheap,
        # so the default cache is accelerator-only; an explicit path/env
        # opts a single-host CPU setup back in.
        return ""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # The remote compile service hides compile latency from the local
    # timer, so the default min-compile-time threshold rejects every
    # entry.  Zero the thresholds ONLY when that backend is in play
    # (detected via its env markers) — on normal backends JAX's own
    # heuristics are correct and keep trivial executables out.
    if _remote_compile_backend():
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    prune_cache(path)
    return path


def _remote_compile_backend() -> bool:
    # The env markers alone are not trustworthy: this image's
    # sitecustomize pins JAX_PLATFORMS=axon even in processes that steer
    # to CPU via jax.config (the test suite) — zeroing the persistence
    # thresholds there persists EVERY trivial CPU executable.  Require
    # the ACTIVE backend to be non-CPU as well.
    import jax

    if jax.default_backend() == "cpu":
        return False
    return (os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
            or "axon" in os.environ.get("JAX_PLATFORMS", ""))


def prune_cache(path: str, max_bytes: int = 4 << 30) -> None:
    """Bound the cache directory: evict oldest-mtime entries past the cap
    (default 4 GiB).  Best-effort — errors are ignored."""
    try:
        entries = []
        total = 0
        for name in os.listdir(path):
            p = os.path.join(path, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        if total <= max_bytes:
            return
        for _, size, p in sorted(entries):
            try:
                os.remove(p)
            except OSError:
                continue
            total -= size
            if total <= max_bytes:
                return
    except OSError:
        pass
