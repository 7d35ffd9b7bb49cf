"""Backend/platform control.

This build environment registers a remote TPU plugin at interpreter startup
and pins JAX_PLATFORMS to it, so switching to host-CPU execution (e.g. for
virtual multi-device tests) must happen through jax.config plus a backend
cache reset — env vars alone are overridden.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def get_device(preference: str = "auto"):
    """Device selection (reference: src/utils.py:133-163 get_device).

    The reference auto-detects cuda/mps/cpu; the TPU-native equivalent picks
    the first device of the requested platform ("auto" = jax's default
    backend, normally the TPU).  Returns a jax.Device.
    """
    import jax

    if preference in ("auto", None, ""):
        return jax.devices()[0]
    if preference == "cpu" and jax.default_backend() != "cpu":
        force_cpu_devices(1)
        return jax.devices("cpu")[0]
    try:
        return jax.devices(preference)[0]
    except RuntimeError:
        logger.warning("No %r devices available; using %s", preference, jax.devices()[0])
        return jax.devices()[0]


def force_cpu_devices(n_devices: int = 8) -> None:
    """Re-point JAX at the host CPU platform with ``n_devices`` virtual
    devices.  Safe to call even after another backend was initialized (clears
    the backend caches); arrays created on the old backend become invalid."""
    import jax

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    jax.config.update("jax_platforms", "cpu")
    # order matters: backend caches must be cleared BEFORE jax_num_cpu_devices
    # may be updated (it refuses once any backend is initialized)
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
    if hasattr(xla_bridge.get_backend, "cache_clear"):
        xla_bridge.get_backend.cache_clear()
    try:  # newer jax reads this config instead of the XLA flag
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:  # pragma: no cover - older versions only use XLA_FLAGS
        pass
    backend = jax.default_backend()
    count = jax.device_count()
    logger.info("Forced CPU platform: backend=%s devices=%d", backend, count)
    if backend != "cpu" or count < n_devices:
        raise RuntimeError(
            f"Failed to force CPU platform with {n_devices} devices "
            f"(got backend={backend}, devices={count})"
        )
