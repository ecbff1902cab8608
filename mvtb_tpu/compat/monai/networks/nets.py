"""``monai.networks.nets.UNet`` facade over the Flax/TPU ResUNet.

Accepts both the MONAI 0.4 (``dimensions=``) and 0.5+ (``spatial_dims=``)
constructor spellings the reference scripts use (``baseline.py:198-205``).
The facade is torch-module-shaped: ``.to(device)``/``.train()``/``.eval()``
chain, ``model(inputs)`` runs the jitted TPU forward on channel-first
arrays, ``.parameters()`` yields real ``torch.nn.Parameter`` copies (so
``torch.optim.Adam(model.parameters(), ...)`` and the scripts'
parameter-count prints work), and ``state_dict``/``load_state_dict`` move
numpy-backed flax trees. Training through torch autograd is the documented
boundary (see the package docstring).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class UNet:
    def __init__(self, dimensions: Optional[int] = None,
                 in_channels: int = 1, out_channels: int = 1,
                 channels: Sequence[int] = (16, 32, 64, 128, 256),
                 strides: Sequence[int] = (2, 2, 2, 2),
                 num_res_units: int = 0, spatial_dims: Optional[int] = None,
                 kernel_size: int = 3, up_kernel_size: int = 3,
                 act: str = "PRELU", norm: str = "INSTANCE",
                 dropout: float = 0.0):
        import jax
        import jax.numpy as jnp

        from mvtb_tpu.models.unet3d import UNet as FlaxUNet

        nd = spatial_dims if spatial_dims is not None else dimensions
        if nd is None:
            nd = 3
        if dropout:
            raise NotImplementedError("the reference never uses dropout")
        self.spatial_dims = int(nd)
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self._model = FlaxUNet(out_channels=out_channels,
                               channels=tuple(channels),
                               strides=tuple(strides),
                               num_res_units=num_res_units)
        # conv parameter shapes do not depend on spatial extent: init on the
        # smallest stride-divisible volume (jitted — eager init over the TPU
        # tunnel dispatches hundreds of tiny compiles).
        side = 1
        for s in strides:
            side *= int(s)
        probe = jnp.zeros((1,) + (max(side, 8),) * self.spatial_dims
                          + (in_channels,), jnp.float32)
        self._params = jax.jit(self._model.init)(
            jax.random.key(0), probe)["params"]

        def fwd(params, x_cf):
            x = jnp.moveaxis(x_cf, 1, -1)
            y = self._model.apply({"params": params}, x)
            return jnp.moveaxis(y, -1, 1)

        self._fwd = jax.jit(fwd)

    # torch-module surface -------------------------------------------------

    def to(self, device=None, *args, **kwargs):
        return self

    def train(self, mode: bool = True):
        return self

    def eval(self):
        return self

    def __call__(self, x):
        from .._tensor import ArrayTensor

        out = np.asarray(self._fwd(self._params, np.asarray(x, np.float32)))
        return out.view(ArrayTensor)

    def forward(self, x):
        return self(x)

    def parameters(self):
        """torch.nn.Parameter COPIES of the jax leaves (for parameter counts
        and optimizer construction; stepping them does not move the jax
        weights — training is the documented boundary)."""
        import jax
        import torch

        if not hasattr(self, "_torch_params"):
            self._torch_params = [
                torch.nn.Parameter(
                    torch.from_numpy(np.array(leaf, copy=True)).float())
                for leaf in jax.tree.leaves(self._params)
            ]
        return iter(self._torch_params)

    def state_dict(self):
        from flax.traverse_util import flatten_dict

        return {"/".join(k): np.asarray(v)
                for k, v in flatten_dict(self._params).items()}

    def load_state_dict(self, sd, strict: bool = True):
        import jax.numpy as jnp
        from flax.traverse_util import flatten_dict, unflatten_dict

        want = {"/".join(k) for k in flatten_dict(self._params)}
        have = set(sd)
        if strict and want != have:
            raise ValueError(f"state_dict mismatch: missing {want - have}, "
                             f"unexpected {have - want}")
        self._params = unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in sd.items()})
        if hasattr(self, "_torch_params"):
            del self._torch_params  # stale copies of the old weights
        return self
