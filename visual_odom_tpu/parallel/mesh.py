"""Device mesh construction.

The reference is strictly single-process (SURVEY.md section 2, parallelism
inventory: no MPI/NCCL/threads anywhere); all multi-device structure in this
framework is new. Axes follow the plan in SURVEY.md:

- "data": independent KITTI sequences / frame batches (DP; BASELINE.json
  eval config 5),
- "model": feature-batch and BA-landmark sharding within a step (TP).

On a real pod slice, create the mesh over `jax.devices()` after
`jax.distributed.initialize()`; under tests, conftest fakes 8 CPU devices
via --xla_force_host_platform_device_count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with named axes of the given sizes (row-major over devices)."""
    devices = list(devices if devices is not None else jax.devices())
    total = int(np.prod(list(axis_sizes.values())))
    if total > len(devices):
        raise ValueError(
            f"mesh wants {total} devices, only {len(devices)} available"
        )
    arr = np.array(devices[:total]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


def data_model_mesh(n_devices: Optional[int] = None,
                    data: Optional[int] = None) -> Mesh:
    """Standard ("data", "model") mesh. Picks data = min(2, n) by default and
    gives the rest to "model"."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        data = 2 if n % 2 == 0 and n >= 2 else 1
    model = n // data
    return make_mesh({"data": data, "model": model}, devs[: data * model])


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). On TPU pods the arguments are
    auto-detected from the environment; pass explicitly elsewhere."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
