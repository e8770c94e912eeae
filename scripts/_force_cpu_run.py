"""Run a repo script with the CPU platform forced (the axon TPU plugin
pre-sets jax.config.jax_platforms, overriding the JAX_PLATFORMS env var —
so plain `JAX_PLATFORMS=cpu python script.py` still inits the TPU tunnel).

Usage: python scripts/_force_cpu_run.py <script.py> [args...]
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
