"""Shared experiment-script setup.

Importing this module applies the ``CNN_GRAPH_CPU=1`` escape hatch: this
build environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) via
sitecustomize *and* pre-configures jax, so forcing CPU needs both the env
var and a live config update.
"""

import os


def maybe_force_cpu():
    if os.environ.get("CNN_GRAPH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


maybe_force_cpu()
