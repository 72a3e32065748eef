"""Name/shape-based parameter sharding rules (DP/FSDP/TP/EP).

Replaces the reference's three separate mechanisms with PartitionSpecs:
- DDP/LegacyDDP data parallelism  (fairseq/trainer.py:35)           -> 'data'
- fairscale FSDP / DeepSpeed ZeRO (fully_sharded_data_parallel.py)  -> 'fsdp'
- Megatron column/row parallel    (model_parallel/megatron_trainer) -> 'tensor'
- X-MoE expert groups             (xmoe/moe_layer.py:72-122)        -> 'expert'

Rules are name+shape heuristics over the flax param tree: column-parallel
kernels (q/k/v/fc1/fc3) put their OUT dim on 'tensor'; row-parallel kernels
(out_proj/fc2) put their IN dim on 'tensor' (GSPMD inserts the psum the
reference did by hand); everything else shards its largest dim on 'fsdp'.
Correctness never depends on these rules — only performance does.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1", "fc3", "query", "key", "value")
ROW_PARALLEL = ("out_proj", "fc2")


def _axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape.get(name, 1)


def _rule(path: Tuple[str, ...], shape: Tuple[int, ...], mesh: Mesh) -> P:
    names = [p for p in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) > 1 else ""
    in_expert = any(n == "experts" for n in names)
    tp = _axis_size(mesh, "tensor") > 1
    fsdp = _axis_size(mesh, "fsdp") > 1
    ep = _axis_size(mesh, "expert") > 1 and in_expert

    def maybe(axis, dim):
        """Use `axis` on `dim` only if divisible."""
        return axis if shape[dim] % _axis_size(mesh, axis) == 0 else None

    # expert params carry a leading expert dim
    offset = 1 if in_expert else 0
    spec = [None] * len(shape)
    if in_expert and ep and shape[0] % _axis_size(mesh, "expert") == 0:
        spec[0] = "expert"

    if leaf == "kernel" and len(shape) == 2 + offset:
        i, o = offset, offset + 1
        if tp and parent in COLUMN_PARALLEL:
            spec[o] = maybe("tensor", o)
            if fsdp:
                spec[i] = maybe("fsdp", i)
        elif tp and parent in ROW_PARALLEL:
            spec[i] = maybe("tensor", i)
            if fsdp:
                spec[o] = maybe("fsdp", o)
        elif fsdp:
            # shard the larger dim on fsdp (ZeRO-3 style)
            dim = i if shape[i] >= shape[o] else o
            spec[dim] = maybe("fsdp", dim)
    elif leaf in ("embedding",) and len(shape) == 2:
        if fsdp:
            spec[0] = maybe("fsdp", 0)
    elif leaf == "kernel" and len(shape) == 4:  # conv [kh, kw, in, out]
        if fsdp:
            spec[3] = maybe("fsdp", 3)
    elif leaf == "bias" and len(shape) == 1 + offset and tp and parent in COLUMN_PARALLEL:
        spec[offset] = maybe("tensor", offset)
    # LN scales/biases, small vectors: replicated
    return P(*spec)


def infer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """PyTree of NamedShardings matching `params`."""

    def f(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path
        )
        return NamedSharding(mesh, _rule(keys, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(f, params)


def batch_sharding(mesh: Mesh, ndim: int = 0) -> NamedSharding:
    """Shard the leading batch dim over data×fsdp (the DP world)."""
    axes = tuple(a for a in ("data", "fsdp") if _axis_size(mesh, a) > 1) or None
    if ndim:
        return NamedSharding(mesh, P(axes, *([None] * (ndim - 1))))
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
