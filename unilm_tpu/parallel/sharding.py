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

    # pipeline-stacked params ([S, L/S, ...] from parallel/pipeline.py):
    # leading dim on 'stage', largest remaining dim on fsdp (ZeRO-in-PP)
    if any(n == "stages" for n in names) and len(shape) >= 2:
        spec = [None] * len(shape)
        if _axis_size(mesh, "stage") > 1 and shape[0] % _axis_size(mesh, "stage") == 0:
            spec[0] = "stage"
        if fsdp and len(shape) > 2:
            for dim in sorted(range(2, len(shape)), key=lambda d: -shape[d]):
                if shape[dim] % _axis_size(mesh, "fsdp") == 0 and shape[dim] > 1:
                    spec[dim] = "fsdp"
                    break
        return P(*spec)

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
            # shard the larger dim on fsdp (ZeRO-3 style); fall back to the
            # other dim when the larger one doesn't divide
            dim = i if shape[i] >= shape[o] else o
            spec[dim] = maybe("fsdp", dim)
            if spec[dim] is None:
                other = o if dim == i else i
                spec[other] = maybe("fsdp", other)
    elif leaf in ("embedding",) and len(shape) == 2:
        if fsdp:
            # odd vocab sizes (RoBERTa 50265, kosmos 65037) don't divide:
            # shard the embed dim instead — the vocab table is usually the
            # single largest tensor and must not stay replicated under ZeRO
            spec[0] = maybe("fsdp", 0)
            if spec[0] is None:
                spec[1] = maybe("fsdp", 1)
    elif leaf == "kernel" and len(shape) == 4:  # conv [kh, kw, in, out]
        if fsdp:
            spec[3] = maybe("fsdp", 3)
            if spec[3] is None:
                spec[2] = maybe("fsdp", 2)
    elif leaf == "bias" and len(shape) == 1 + offset and tp and parent in COLUMN_PARALLEL:
        spec[offset] = maybe("tensor", offset)
    # anything ≥2D still unmatched (rel-pos tables, scan-stacked params,
    # mask tokens with leading singleton dims...): shard the largest
    # divisible dim on fsdp — guards sharding-rule rot as models grow
    # (tests/test_sharding_coverage.py asserts the invariant).
    if fsdp and len(shape) >= 2 and all(s is None for s in spec):
        for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if shape[dim] % _axis_size(mesh, "fsdp") == 0 and shape[dim] > 1:
                spec[dim] = "fsdp"
                break
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
