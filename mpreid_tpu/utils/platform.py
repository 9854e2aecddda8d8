"""Platform selection honoring ``MODEL.DEVICE``.

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
