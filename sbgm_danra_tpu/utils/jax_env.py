"""One shared JAX runtime setup for every entry point.

Previously copy-pasted (with drift) across cli/main_app.py, serve.py,
sweep/run_sweep.py and scripts/perf_probe.py; any new CLI should call
:func:`setup_jax_env` instead of re-implementing the two knobs:

- ``SBGM_FORCE_CPU=1`` switches the live platform to CPU. The session
  environment pins the TPU platform before any env var can take effect (jax
  is imported at interpreter startup by a sitecustomize hook), so the
  in-process config update is the only reliable CPU switch — and host-only
  modes must not claim the single-tenant TPU out from under a training run.
- the persistent compile cache (default ``/tmp/jax_comp_cache``,
  ``JAX_COMPILATION_CACHE_DIR`` overrides): remote (tunnel) compiles of the
  flagship train/sampler programs run minutes-to-tens-of-minutes; cached
  reruns are seconds.
"""

from __future__ import annotations

import os


def setup_jax_env(compile_cache: bool = True) -> None:
    """Apply SBGM_FORCE_CPU and (optionally) the persistent compile cache."""
    import jax

    if os.environ.get("SBGM_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    if compile_cache:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
