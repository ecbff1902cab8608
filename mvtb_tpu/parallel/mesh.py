"""Device mesh + sharding helpers: data parallelism over ICI.

The reference has no distributed code at all (every script pins
``torch.device("cuda:0")``, SURVEY.md section 2.5); this module is the
TPU-native scale-out path it lacked. Design: an N-dimensional
``jax.sharding.Mesh`` whose leading ``"data"`` axis shards the batch; model
parameters are replicated (a ``"model"`` axis is reserved for future tensor
sharding). Gradients all-reduce over ICI automatically — ``jax.jit`` sees
batch-sharded inputs + replicated params and inserts the ``psum`` itself,
which is the XLA-idiomatic replacement for NCCL all-reduce calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    With ``n_data=None`` all devices go on the data axis. ``n_model > 1``
    reserves a model axis for parameter sharding (layout chosen so the model
    axis maps to adjacent devices — innermost, fastest ICI hops).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with their batch axis sharded over the mesh."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh.

    Leaves are copied, not aliased: ``device_put`` may share the source
    buffer for the shard already resident on a device, and the train steps
    donate their state — an aliased replica would die with the original.
    """
    sh = replicated(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(jax.numpy.array(a, copy=True), sh), tree)
