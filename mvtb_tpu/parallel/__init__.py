"""Device mesh + sharding helpers (data parallelism over ICI, multi-host
over DCN)."""

from mvtb_tpu.parallel.distributed import (
    distributed_mesh,
    global_batch,
    initialize,
    process_local_indices,
)
from mvtb_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from mvtb_tpu.parallel.tp import shard_params_tp, shard_state_tp, tp_param_sharding

__all__ = ["batch_sharding", "distributed_mesh", "global_batch", "initialize",
           "make_mesh", "process_local_indices", "replicate", "replicated",
           "shard_batch", "shard_params_tp", "shard_state_tp",
           "tp_param_sharding"]
