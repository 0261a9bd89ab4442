"""Device mesh construction for GSPMD sharding.

The reference has no distributed layer at all (SURVEY.md §2, parallelism
accounting: single Metal device, no collectives). This module is the TPU
build's scale-out foundation: a ``jax.sharding.Mesh`` with ``(data, model)``
axes — data-parallel batched generation across chips, tensor-parallel MMDiT
within a model-axis group, collectives compiled by XLA over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils import get_logger

logger = get_logger(__name__)


def create_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    The model axis should map to the fastest interconnect (ICI neighbours);
    ``jax.devices()`` order already follows the physical torus on TPU slices,
    so a contiguous reshape keeps TP collectives on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} available devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def local_mesh() -> Mesh:
    """Single-device mesh: the degenerate case every jitted fn also accepts."""
    return create_mesh(1, 1, devices=jax.devices()[:1])


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host initialisation (jax.distributed over ICI/DCN).

    No-op on single-process; call before any jax usage on multi-host pods.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        logger.info(
            "jax.distributed initialised: process %s/%s", process_id, num_processes
        )
