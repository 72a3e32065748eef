"""Device mesh construction.

Replaces fairseq's distributed_init + process-group registry
(fairseq/distributed/utils.py:244-494). One mesh, four axes:

- stage:  pipeline-parallel axis (GPipe stages, parallel/pipeline.py — the
          --pipeline-model-parallel equivalent); outermost so multi-slice
          DCN carries only the once-per-tick activation hop
- data:   pure data parallel (DDP equivalent, grads all-reduced by GSPMD)
- fsdp:   parameter/optimizer sharding axis (FSDP/ZeRO equivalent)
- tensor: tensor-parallel axis (Megatron column/row splits)
- expert: MoE expert parallelism (X-MoE all_to_all groups)
- seq:    sequence/context parallelism (flash-chunk ring attention,
          parallel/ring_attention.py + long_context.py)

Axes of size 1 are free; ICI carries intra-slice traffic, DCN multi-slice.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES = ("stage", "data", "fsdp", "tensor", "expert", "seq")


def make_mesh(
    axis_sizes: Optional[Mapping[str, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. Unspecified axes default to 1; a single axis may be -1
    to absorb the remaining devices (like torch's world_size inference)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = dict.fromkeys(MESH_AXES, 1)
    if axis_sizes:
        for k, v in axis_sizes.items():
            if k not in sizes:
                raise ValueError(f"unknown mesh axis {k!r}; use {MESH_AXES}")
            sizes[k] = v
    wild = [k for k, v in sizes.items() if v == -1]
    if len(wild) > 1:
        raise ValueError("only one axis may be -1")
    fixed = int(np.prod([v for v in sizes.values() if v != -1]))
    if wild:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by {fixed}")
        sizes[wild[0]] = n // fixed
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(f"mesh {sizes} needs {total} devices, have {n}")
    arr = np.asarray(devices).reshape([sizes[a] for a in MESH_AXES])
    return Mesh(arr, MESH_AXES)


def data_parallel_mesh(devices=None) -> Mesh:
    return make_mesh({"data": -1}, devices=devices)
