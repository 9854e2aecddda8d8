"""Platform selection + compilation-cache setup, honoring ``MODEL.DEVICE``.

The host environment may pin JAX to a remote TPU plugin via sitecustomize;
``JAX_PLATFORMS`` in the environment is ignored by that path, but
``jax.config.update`` after import reliably takes effect. Call this before
any JAX computation.
"""

from __future__ import annotations


def apply_device(cfg) -> None:
    device = str(cfg.MODEL.DEVICE).lower()
    if device in ("cpu", "tpu", "gpu"):
        import jax

        if device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        # 'tpu'/'gpu': leave the default platform resolution alone
    apply_compile_cache(cfg)


def apply_compile_cache(cfg) -> None:
    """Persistent XLA compilation cache (``TPU.COMPILE_CACHE_DIR``).

    The Uni-Prompt pipeline jit-compiles one program per (stage, step shape)
    — each 20-40 s on the TPU. With a cache dir set, recompiles of unchanged
    programs across process restarts become disk loads. The reference has no
    analogue (torch eager); this is standard jax persistent-cache wiring.
    """
    cache = str(getattr(cfg.TPU, "COMPILE_CACHE_DIR", "") or "")
    if not cache:
        return
    import os

    import jax

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache everything that took meaningful compile time (default 1 s
    # skips tiny helper programs, keeps every model step)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
