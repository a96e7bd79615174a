"""Persistent XLA compilation cache.

TPU compiles of the flagship models take 40s-10min (tunnel-measured); the
reference has no equivalent concern (torch eager). JAX's persistent
compilation cache serializes compiled executables keyed by HLO hash, so a
restarted trainer or a fresh serving process skips recompilation entirely
(measured through the TPU tunnel: second process 0.0s vs 40s+ cold).

Enabled via ``compilation_cache_dir`` in the scheme config (Trainer) or the
``compilation_cache_dir`` argument of the serving predictors.
"""
import threading
from typing import Optional

import jax

_lock = threading.Lock()
_enabled_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: Optional[str]) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; returns True if the cache is active afterwards. A ``None``
    or empty dir is a no-op (returns False). Thresholds are lowered so even
    quick bucket-ladder shapes are cached (the default 1s/small-entry
    cutoffs would skip most eval shapes).
    """
    global _enabled_dir
    if not cache_dir:
        return False
    with _lock:
        if _enabled_dir == cache_dir:
            return True
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        if _enabled_dir is not None:
            # jax initializes its cache object lazily and then latches it;
            # re-pointing mid-process (tests, multi-model services) needs an
            # explicit reset or writes keep going to the old directory
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
        _enabled_dir = cache_dir
    return True
