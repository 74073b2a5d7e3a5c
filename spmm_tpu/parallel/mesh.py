"""Device-mesh helpers.

The reference's distribution layer is `cupyx.distributed` (/root/reference
modify_src/cupy-src/cupyx/distributed/_init.py:14 — NCCL process groups, one
process per GPU, TCP-store rendezvous).  The TPU-native replacement is a
`jax.sharding.Mesh` over ICI with `shard_map`/GSPMD collectives; multi-host
bring-up is `jax.distributed.initialize` (DCN rendezvous plays the TCPStore
role).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def init_process_group(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the `init_process_group` analogue).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass coordinator/num/id explicitly, mirroring
    `_init.py:14 (n_devices, rank, host, port)`.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("rows",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a Mesh over the first `n_devices` devices.

    1-D ('rows',) is the default for row-partitioned SpMV/SpMM/SpGEMM;
    pass axes=("rows", "cols") + shape for 2-D (SUMMA-style) layouts.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def row_sharded(mesh: Mesh, axis: str = "rows") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))
