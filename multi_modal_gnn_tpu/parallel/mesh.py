"""Device mesh construction."""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

DATA_AXIS = "data"


MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = 0,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence] = None,
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """A 1-D (default) or N-D mesh over available devices.

    Args:
        num_devices: how many devices to use (0 = all available).
        axis_names: mesh axis names; 1-D ``("data",)`` by default.
        devices: explicit device list (defaults to jax.devices()).
        axis_sizes: per-axis sizes for N-D meshes.  One entry may be -1
            (inferred).  Required when ``len(axis_names) > 1``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(f"Requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        if axis_sizes is None or len(axis_sizes) != len(axis_names):
            raise ValueError(
                f"axis_sizes (one per axis name {tuple(axis_names)}) is required "
                "for N-D meshes"
            )
        arr = arr.reshape(tuple(axis_sizes))
    mesh = Mesh(arr, axis_names=tuple(axis_names))
    logger.info("Mesh: %d devices over axes %s", arr.size, dict(mesh.shape))
    return mesh


def make_2d_mesh(num_devices: int = 0, model_parallel: int = 2, devices=None) -> Mesh:
    """The canonical ("data", "model") mesh — shared by the GSPMD trainer and
    the explicit 2-D shard_map trainer (one constructor, one device order)."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices and num_devices > 0 else len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    return make_mesh(
        n,
        axis_names=(DATA_AXIS, MODEL_AXIS),
        devices=devices,
        axis_sizes=(n // model_parallel, model_parallel),
    )
