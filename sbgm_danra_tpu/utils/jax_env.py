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
- :func:`stabilize_tpu_cache_key` makes TPU cache keys survive remote-server
  rotation (the r3 BENCH postmortem root cause).
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


def stabilize_tpu_cache_key() -> None:
    """Make persistent-cache keys for TPU programs stable across remote-server
    rotations.

    Root cause of the r3 empty BENCH artifact: jax hashes
    ``backend.platform_version`` (here the axon server's build string, e.g.
    "axon 0.1.0; ... Built on <date> cl/NNN") and the serialized PJRT topology
    into every cache key. The tunnel can attach to a differently-built server
    between invocations, so entries written in one session never hit in the
    next — the same 630 s flagship-scan compile repeats forever no matter
    where the cache directory lives. Diagnosed with two key-component probes
    (identical within a session; the judge's same-disk r3 entries all missed).

    Fix: for TPU backends hash platform + device_kind (e.g. "TPU v5 lite")
    instead of the full version string/topology proto. Safe because a cached
    executable a NEW server build cannot load makes jax's ``_cache_read``
    warn and recompile (jax/_src/compiler.py) — the fallback is a cold
    compile, exactly what a key miss would have been. CPU backends keep the
    default hashing: their executables embed HOST machine code, where
    cross-machine reuse is genuinely unsafe (the MULTICHIP_r03 cpu_aot_loader
    warnings).
    """
    import jax._src.cache_key as ck

    if getattr(ck, "_sbgm_stable_tpu_keys", False):
        return

    orig_platform, orig_accel = ck._hash_platform, ck._hash_accelerator_config

    def _hash_platform(hash_obj, backend):
        if backend.platform == "tpu":
            ck._hash_string(hash_obj, backend.platform)
            kinds = ",".join(sorted({d.device_kind for d in backend.local_devices()}))
            ck._hash_string(hash_obj, kinds)
        else:
            orig_platform(hash_obj, backend)

    def _hash_accelerator_config(hash_obj, accelerators):
        kinds = {d.device_kind for d in accelerators.flat}
        if any("tpu" in k.lower() for k in kinds):
            ck._hash_devices(hash_obj, accelerators)
        else:
            orig_accel(hash_obj, accelerators)

    ck._hash_platform = _hash_platform
    ck._hash_accelerator_config = _hash_accelerator_config
    ck._sbgm_stable_tpu_keys = True
