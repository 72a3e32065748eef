"""L1: device mesh, sharding rules, collective helpers (SURVEY.md §2.9).

The reference's process-group zoo (fairseq/distributed/utils.py:455-494:
data-parallel group × model-parallel group × MoE expert/all2all groups)
becomes one jax.sharding.Mesh with named axes; DP/FSDP/TP/EP are
PartitionSpecs over those axes and XLA/GSPMD inserts the collectives.
"""

from unilm_tpu.parallel.mesh import MESH_AXES, make_mesh
from unilm_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_shardings,
    replicated,
)

__all__ = [
    "MESH_AXES",
    "make_mesh",
    "infer_param_shardings",
    "batch_sharding",
    "replicated",
]
