"""Tensor (model) parallelism: shard parameters over the mesh's model axis.

SURVEY.md section 2.5 asks for a mesh left N-dimensional "so model sharding
can be added" — this adds it. Convolution kernels (and their biases) shard
on the output-channel dimension over the ``model`` axis; XLA GSPMD then
partitions every conv and inserts the ICI collectives itself when the jitted
train step runs on (data x model)-sharded inputs. No model code changes:
sharding is purely a placement rule over the parameter pytree.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_sharding(mesh: Mesh, param: jax.Array,
                      axis_name: str = "model") -> NamedSharding:
    """Sharding rule for one parameter: split the trailing (output-channel)
    dimension over the model axis when it divides evenly; replicate others.

    Covers Flax conv kernels ``(*window, in, out)``, dense ``(in, out)``, and
    bias/scale vectors ``(out,)``; scalars (PReLU slopes) replicate.
    """
    n = mesh.shape[axis_name]
    if n > 1 and param.ndim >= 1 and param.shape[-1] % n == 0 \
            and param.shape[-1] >= n:
        spec = [None] * (param.ndim - 1) + [axis_name]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params_tp(mesh: Mesh, params, axis_name: str = "model"):
    """device_put a parameter pytree with tensor-parallel placement."""
    return jax.tree.map(
        lambda p: jax.device_put(p, tp_param_sharding(mesh, p, axis_name)),
        params)


def shard_state_tp(mesh: Mesh, state, axis_name: str = "model"):
    """Tensor-shard a TrainState: params and matching optimizer moments get
    the same placement; everything else replicates."""
    params = shard_params_tp(mesh, state.params, axis_name)

    def opt_rule(p):
        if hasattr(p, "ndim") and hasattr(p, "shape"):
            return jax.device_put(p, tp_param_sharding(mesh, p, axis_name))
        return p

    opt_state = jax.tree.map(opt_rule, state.opt_state)
    return state.replace(params=params, opt_state=opt_state)
