"""meshclust-tpu: TPU-native DNA sequence mean-shift clustering.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BioinformaticsToolsmith/MeShClust (James et al., NAR 2018).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the engine dispatches many small jitted
# steps; caching across runs removes recompile latency (esp. with the axon
# remote-compile path). Disable with MESHCLUST_JAX_CACHE=0.
if _os.environ.get("MESHCLUST_JAX_CACHE", "1") != "0":
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/jax_cache_meshclust"))
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

from meshclust_tpu.config import ClusterConfig  # noqa: F401,E402
