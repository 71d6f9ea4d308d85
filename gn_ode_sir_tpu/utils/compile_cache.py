"""Persistent XLA compilation cache for experiment-matrix processes.

The monitorers (reference ``monitorer-sim.py:130-143`` / ``monitorer-ngraphs.py``)
spawn one fresh process per (model, trial) run. The reference pays no
per-process JIT cost (eager torch); under XLA every fresh process re-compiles
the identical HLO — the matrix's repeats share every shape and config and
differ only in seeds, which never enter the HLO. Through the remote-TPU
tunnel those compiles cost minutes per run (measured: a GIN multigraph run
spends ~1300 s of its 1511 s wall outside the 500 training epochs,
``runs_r4/chain_r4b.log`` cycle 5), so the matrix wall-clock is dominated by
redundant compilation. JAX's persistent compilation cache de-duplicates this
across processes by serializing compiled executables keyed by HLO hash.

Enabled from the CLI entry points (worker/monitorer/bench) — never at import
time (process-global config mutation belongs to mains, not imports). Backends
that cannot serialize executables (some PJRT plugins) degrade to a logged
warning per JAX's own fallback, never an error.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_compilation_cache"]


def enable_persistent_compilation_cache(
    path: str | None = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> str | None:
    """Point this process's XLA compiles at an on-disk cache; return its dir.

    ``GN_JAX_CACHE=0`` disables (returns None); ``GN_JAX_CACHE_DIR`` overrides
    the default ``~/.cache/gn_ode_sir_tpu/xla_cache``. Entries cheaper than
    ``min_compile_time_secs`` are not persisted (tiny compiles re-do faster
    than they deserialize).
    """
    flag = os.environ.get("GN_JAX_CACHE", "1").strip().lower()
    if flag in ("0", "false", "off"):
        return None
    import jax

    cache_dir = path or os.environ.get("GN_JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "gn_ode_sir_tpu", "xla_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # jax pins the cache object (and its "is the cache used?" memo) at the
        # first compile of the process; re-pointing the dir afterwards (tests,
        # notebooks, long-lived drivers) is silently ignored without a reset.
        from jax._src import compilation_cache as _cc

        if _cc._cache_initialized or _cc._cache_checked:
            _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # pragma: no cover - config surface drift
        print(f"persistent compilation cache unavailable: {exc}")
        return None
    return cache_dir
