"""``monai.networks.nets.UNet`` facade over the Flax/TPU ResUNet.

Accepts both the MONAI 0.4 (``dimensions=``) and 0.5+ (``spatial_dims=``)
constructor spellings the reference scripts use (``baseline.py:198-205``).
The facade is torch-module-shaped: ``.to(device)``/``.train()``/``.eval()``
chain, ``model(inputs)`` runs the jitted TPU forward on channel-first
arrays, ``.parameters()`` yields real ``torch.nn.Parameter`` views of the
flax leaves, and ``state_dict``/``load_state_dict`` move numpy-backed flax
trees.

Grad bridge (closes the training half of the "rerun unchanged" clause):
the reference's verbatim loop (``baseline.py:232-248``)

    optimizer.zero_grad(); outputs = model(inputs)
    loss = loss_function(outputs, labels); loss.backward(); optimizer.step()

works end-to-end — ``model(inputs)`` tapes (model, inputs) onto the output,
``DiceLoss`` carries the tape onto the loss value, ``loss.backward()``
computes ``jax.value_and_grad`` of dice∘forward over the flax params and
populates ``.grad`` on the SAME ``torch.nn.Parameter`` objects the
optimizer holds, and the next forward syncs the stepped torch values back
into the flax tree. Cost note: backward re-runs the forward inside the
jitted value_and_grad (the facade forward's activations are not reused), so
one loop iteration is ~2 forwards + 1 backward — fine at compat-test scale;
production training uses the TPU-native jitted steps (``train/seg.py``).

The facade is a real ``torch.nn.Module`` subclass so it composes inside
user-defined modules — the learnable-layer scripts build their own

    class Gibbs_UNet(nn.Module):
        def __init__(self, alpha): self.gibbs = GibbsNoiseLayer(alpha);
                                   self.ResUnet = UNet(...)

(``gibbs0p7_layer_domain_GD.py:192-212``) and call
``Adam(model.parameters(), ...)`` on the composition: the flax leaves are
registered as named parameters, so ``nn.Module.parameters()`` recursion
finds them. Device moves (``.to(cuda)``, ``.float()``) are no-ops — the
leaves are host-side views and the jitted forward moves data to the TPU —
via a ``_apply`` override, so ``.to(torch.device("cuda:0"))`` on a
composition succeeds on a CPU-only torch build.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import torch


class UNet(torch.nn.Module):
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

        super().__init__()
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

        # register live torch Parameter views of the flax leaves so
        # nn.Module.parameters() recursion (incl. from a composing user
        # module) sees them; names follow the flax tree paths.
        from flax.traverse_util import flatten_dict

        leaves, self._treedef = jax.tree.flatten(self._params)
        names = ["/".join(k) for k in sorted(flatten_dict(self._params))]
        assert len(names) == len(leaves)
        self._torch_params = [
            torch.nn.Parameter(
                torch.from_numpy(np.array(leaf, np.float32, copy=True)))
            for leaf in leaves
        ]
        for name, p in zip(names, self._torch_params):
            self.register_parameter(name.replace(".", "_"), p)
        self._torch_versions = self._param_fingerprint()

    def _param_fingerprint(self):
        return [(p._version, p.data.data_ptr()) for p in self._torch_params]

    # torch-module surface -------------------------------------------------

    def to(self, device=None, *args, **kwargs):
        return self

    def _apply(self, fn, recurse=True):
        # Parameters are host-side views of the flax tree: device moves /
        # dtype casts are no-ops (the jitted forward moves data to the TPU),
        # and this keeps `.to(torch.device("cuda:0"))` on a composing module
        # from touching CUDA on a CPU-only torch build.
        return self

    def _sync_from_torch(self):
        """Copy (possibly optimizer-stepped) torch parameter values back into
        the flax tree. Called before every forward once ``parameters()`` has
        been materialized, so ``torch.optim.*.step()`` takes effect on the
        next ``model(inputs)`` — the second half of the grad bridge.

        Change detection: torch's per-tensor ``_version`` counter (bumped by
        every in-place op, which is how ``torch.optim`` steps write) plus
        the storage pointer, so a ``p.data = new_tensor`` rebind is also
        caught (round-4 ADVICE item 4). Out-of-place updates that keep the
        same storage AND bypass versioning are not observable from outside
        torch and are not bridged."""
        if getattr(self, "_torch_params", None) is None:
            return
        import jax
        import jax.numpy as jnp

        versions = self._param_fingerprint()
        if versions == getattr(self, "_torch_versions", None):
            return  # no in-place step since the last sync
        leaves = [jnp.asarray(np.asarray(p.detach().numpy(), np.float32))
                  for p in self._torch_params]
        self._params = jax.tree.unflatten(self._treedef, leaves)
        self._torch_versions = versions

    def forward(self, x):
        from .._tensor import ArrayTensor

        self._sync_from_torch()
        x_np = np.asarray(x, np.float32)
        out = np.asarray(self._fwd(self._params, x_np)).view(ArrayTensor)
        # tape for the grad bridge: DiceLoss propagates these onto the loss
        # value so loss.backward() can differentiate dice∘forward
        out._mvtb_model = self
        out._mvtb_input = x_np
        return out

    def _accumulate_torch_grads(self, grads):
        """Scatter a flax grad tree into ``.grad`` on the torch parameters,
        accumulating like torch autograd (the reference zeroes per step)."""
        import jax

        for p, g in zip(self._torch_params, jax.tree.leaves(grads)):
            # np.array (not ascontiguousarray — it promotes 0-d to (1,),
            # breaking scalar params like PReLU slopes); copy=True gives
            # torch a writable buffer
            g_t = torch.from_numpy(np.array(g, np.float32, copy=True))
            p.grad = g_t if p.grad is None else p.grad + g_t

    def _value_and_grad_fn(self, loss_cfg: tuple):
        """Jitted ``value_and_grad`` of dice(forward(params, x), target) for
        one DiceLoss configuration; cached per config."""
        import jax
        import jax.numpy as jnp

        cache = getattr(self, "_vg_cache", None)
        if cache is None:
            cache = self._vg_cache = {}
        if loss_cfg not in cache:
            (sigmoid, squared_pred, include_background,
             smooth_nr, smooth_dr) = loss_cfg

            def loss_from_params(params, x_cf, tgt_cf):
                from mvtb_tpu.train.losses import dice_loss

                x = jnp.moveaxis(x_cf, 1, -1)
                y = self._model.apply({"params": params}, x)
                return dice_loss(
                    y, jnp.moveaxis(tgt_cf, 1, -1), sigmoid=sigmoid,
                    squared_pred=squared_pred, smooth_nr=smooth_nr,
                    smooth_dr=smooth_dr,
                    include_background=include_background)

            cache[loss_cfg] = jax.jit(jax.value_and_grad(loss_from_params))
        return cache[loss_cfg]

    def state_dict(self, *args, destination=None, prefix="", keep_vars=False):
        """Flax-keyed state dict ("enc/conv/kernel"-style names). Cooperates
        with ``nn.Module.state_dict`` recursion from a composing module
        (``destination``/``prefix`` protocol), so ``torch.save(
        composition.state_dict(), ...)`` in the reference scripts works."""
        from flax.traverse_util import flatten_dict

        if args:  # legacy positional (destination, prefix, keep_vars)
            destination = args[0]
            if len(args) > 1:
                prefix = args[1]

        self._sync_from_torch()  # pick up optimizer steps since last forward
        # emit torch tensors (not numpy): reference scripts reload with a
        # bare torch.load(path), and torch>=2.6's weights_only=True default
        # rejects numpy globals in the pickle
        items = {prefix + "/".join(k):
                 torch.from_numpy(np.array(v, np.float32, copy=True))
                 for k, v in flatten_dict(self._params).items()}
        if destination is None:
            return items
        destination.update(items)
        return destination

    def _set_params(self, params):
        """Install a new flax tree and refresh the live torch views in place
        (torch semantics: ``load_state_dict`` copies INTO the existing
        Parameter objects so optimizer bindings survive)."""
        import jax

        self._params = params
        with torch.no_grad():
            for p, leaf in zip(self._torch_params, jax.tree.leaves(params)):
                p.copy_(torch.from_numpy(
                    np.array(leaf, np.float32, copy=True)))
        self._torch_versions = self._param_fingerprint()

    def load_state_dict(self, sd, strict: bool = True, assign: bool = False):
        import jax.numpy as jnp
        from flax.traverse_util import flatten_dict, unflatten_dict

        want = {"/".join(k) for k in flatten_dict(self._params)}
        have = set(sd)
        if strict and want != have:
            raise ValueError(f"state_dict mismatch: missing {want - have}, "
                             f"unexpected {have - want}")
        self._set_params(unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(np.asarray(v))
             for k, v in sd.items()}))
        return self

    def _load_from_state_dict(self, state_dict, prefix, local_metadata,
                              strict, missing_keys, unexpected_keys,
                              error_msgs):
        """torch recursion protocol: lets ``composition.load_state_dict``
        (``nn.Module`` machinery on a user-defined wrapper) restore this
        facade from its ``prefix``-scoped flax-keyed entries."""
        import jax.numpy as jnp
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(self._params)
        sub, missing = {}, []
        for k, cur in flat.items():
            name = prefix + "/".join(k)
            if name in state_dict:
                sub[k] = jnp.asarray(np.asarray(state_dict[name]))
            else:
                # torch strict=False semantics: load the present subset,
                # keep current values for (reported-)missing keys
                missing.append(name)
                sub[k] = cur
        missing_keys.extend(missing)
        if len(missing) < len(flat):
            self._set_params(unflatten_dict(sub))
