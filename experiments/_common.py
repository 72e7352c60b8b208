"""Shared experiment-script setup.

Importing this module applies:
* the ``CNN_GRAPH_CPU=1`` escape hatch — this build environment pins
  ``JAX_PLATFORMS=axon`` (TPU tunnel) via sitecustomize *and*
  pre-configures jax, so forcing CPU needs both the env var and a live
  config update;
* the persistent compilation cache — the tunnel's remote compiles take
  minutes; cached re-runs take seconds.
"""

import os


def maybe_force_cpu():
    if os.environ.get("CNN_GRAPH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


def enable_compile_cache(path: str = "/root/.jax_cache"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


maybe_force_cpu()
enable_compile_cache()
