"""Persistent XLA compile cache setup, shared by bench.py and the tools.

The DFormer-L train-step compile takes multiple minutes on this runtime;
the persistent cache (verified to work on the axon backend) amortizes it
across harness invocations. Must be called before backend init. On older
jax without these config options the call degrades to a no-op — the cache
is an optimization, never a requirement (ADVICE r4: the tools previously
duplicated bench.py's guarded version unguarded and would have crashed
where bench degraded gracefully).
"""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at the repo-local .jax_cache; returns the dir or None.

    DFORMER_NO_COMPILE_CACHE=1 disables it: on the tunneled axon backend a
    cache HIT must stream the serialized executable to the device server,
    and for multi-hundred-MB entries that measured slower than the
    terminal-side recompile it was meant to avoid (round-5 postmortem)."""
    import jax

    if os.environ.get("DFORMER_NO_COMPILE_CACHE") == "1":
        return None
    if cache_dir is None:
        cache_dir = os.path.join(_REPO_ROOT, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None  # older jax: silently skip
    return cache_dir
