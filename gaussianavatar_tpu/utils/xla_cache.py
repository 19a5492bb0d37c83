"""Persistent XLA compilation cache for the CLIs.

Every CLI process (train/eval/render) pays the full XLA+Mosaic compile of
the fused step / render pipeline — measured at multiple minutes per process
on TPU. The reference never recompiles because torch extensions are
AOT-built; this is the JAX-native equivalent: compiled executables are
persisted and re-loaded across processes.

Controlled by $GSAVATAR_XLA_CACHE:
  unset        -> ~/.cache/gaussianavatar_tpu/xla (created on demand)
  a directory  -> that directory
  "off"        -> disabled
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Configure jax's persistent compilation cache; returns the cache dir
    (None when disabled). Call after importing jax, before first jit."""
    loc = os.environ.get("GSAVATAR_XLA_CACHE", "")
    if loc.lower() == "off":
        return None
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "gaussianavatar_tpu", "xla"
        )
    try:
        import jax

        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # cache everything that took real compile time; tiny programs are
        # cheaper to recompile than to round-trip through the cache
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a hard failure
        print(f"xla cache disabled ({e})")
        return None
    return loc
