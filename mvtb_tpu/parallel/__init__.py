"""Device mesh + sharding helpers (data parallelism over ICI)."""

from mvtb_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from mvtb_tpu.parallel.tp import shard_params_tp, shard_state_tp, tp_param_sharding

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch", "shard_params_tp", "shard_state_tp",
           "tp_param_sharding"]
