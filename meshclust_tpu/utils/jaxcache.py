"""Persistent XLA/Mosaic compilation cache.

On the tunneled TPU the remote compile service dominates cold-start wall
time (tens of seconds PER SHAPE); the reference binary has no such cost.
Enabling JAX's persistent cache makes every compile a one-time cost per
machine instead of per process — the production analogue of the reference
shipping a prebuilt binary.

Call enable() before the first jit dispatch. Opt out with
MESHCLUST_JAX_CACHE=0, relocate with MESHCLUST_JAX_CACHE=<dir>.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/meshclust_tpu/jax")
_done = False


def enable() -> None:
    global _done
    if _done:
        return
    _done = True
    knob = os.environ.get("MESHCLUST_JAX_CACHE", "")
    if knob == "0":
        return
    path = knob if knob not in ("", "1") else _DEFAULT_DIR
    try:
        import jax
        if jax.default_backend() != "tpu":
            return   # CPU AOT cache entries are machine-feature-pinned
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, however fast the compile was
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax knob names; cache is an optimization only
