"""Device-mesh and sharding helpers.

The reference is strictly single-device (``train_model.py:135``; no
torch.distributed anywhere — SURVEY.md section 2.9). Here distribution is
first-class: a 2-axis ``jax.sharding.Mesh`` (``data``: batch-parallel,
``space``: spatial sharding of volumes), shardings expressed as
``NamedSharding`` partition specs, and XLA inserting the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def create_mesh(data: int = -1, space: int = 1,
                axis_names: Tuple[str, str] = ("data", "space"),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, space) mesh; ``data=-1`` fills remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % space != 0:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space > n:
        raise ValueError(
            f"mesh {data}x{space} needs {data * space} devices, have {n}")
    grid = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(grid, axis_names)


def mesh_from_config(cfg: MeshConfig,
                     devices: Optional[Sequence[jax.Device]] = None
                     ) -> Mesh:
    return create_mesh(cfg.data, cfg.space, cfg.axis_names, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over 'data'; spatial D dim over 'space' if its size > 1.

    Layout for (B, D, H, W, C) activations / batches.
    """
    if mesh.shape.get("space", 1) > 1:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def local_device_count() -> int:
    return jax.local_device_count()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host SPMD bring-up (``jax.distributed.initialize``): the
    communication backend is XLA collectives over ICI/DCN — there is no
    NCCL/MPI analog to configure (SURVEY.md section 2.9). No-op when
    already initialized or single-process."""
    import jax
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError) as e:
        logger = __import__("logging").getLogger(__name__)
        logger.info("jax.distributed.initialize skipped: %s", e)
