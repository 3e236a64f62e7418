"""instant_nvr_tpu — TPU-native framework for fast dynamic-human neural volumetric
representations ("Learning Neural Volumetric Representations of Dynamic Humans in
Minutes", CVPR 2023).

Built from scratch for TPU (JAX / XLA / Pallas / pjit):
  - one fused, jitted render+loss step (no chunked Python loops on the hot path)
  - static shapes everywhere: fixed-budget top-k culling replaces data-dependent
    ``nonzero`` gathers
  - the five part networks run as a stacked/vmapped "expert" axis, not a Python loop
  - KNN blend weights via MXU-friendly batched distance matmuls + ``lax.top_k``
  - ray axis sharded over a ``jax.sharding.Mesh`` for multi-chip scale-out

Reference behavior parity target: zju3dv/instant-nvr (see SURVEY.md).
"""

__version__ = "0.1.0"

# Persistent compilation cache: remote (tunneled) TPU compiles cost ~40s per
# program, and the env pre-imports jax via sitecustomize, so the env var
# alone can be too late — set the config directly at package import.
def _setup_compilation_cache():
    import os
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # NVR_PLATFORM=cpu forces the CPU backend for any CLI entry point.
        # JAX_PLATFORMS alone is NOT enough in environments whose
        # sitecustomize registers a PJRT plugin (the plugin still
        # initializes — and hangs if its device tunnel is down); the config
        # update must happen after import and before first backend use.
        plat = os.environ.get("NVR_PLATFORM", "")
        if plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # ancient jax / no config knob: run uncached


_setup_compilation_cache()
