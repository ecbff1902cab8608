"""Differentiable stylization layers: corruption *inside* the model.

TPU-native rebuild of ``source_code/stylization_layers.py``: the Gibbs layer's
cut-off ``alpha`` is a real Flax parameter trained by plain ``jax.grad``
through a sigmoid-soft mask — replacing the reference's finite-difference
loop (``gibbs0p7_layer_domain_GD.py:252-269``), whose hard ``where``-pair mask
has zero gradient a.e. (see :func:`mvtb_tpu.ops.masks.reference_gibbs_layer_mask`).
A ``hard=True`` mode reproduces the reference mask exactly for use with the
finite-difference trainer (:mod:`mvtb_tpu.train.learnable`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvtb_tpu.ops import (
    fft_shifted,
    ifft_shifted_real,
    kspace_spike_random,
    reference_gibbs_layer_mask,
    soft_gibbs_mask,
)
from mvtb_tpu.models.unet3d import UNet


class GibbsNoiseLayer(nn.Module):
    """Learnable Gibbs filter (``stylization_layers.py:55-116``).

    Input/output layout is channel-first ``(B, C, *spatial)`` to match how
    the reference composes it in front of a UNet. ``alpha`` is initialized
    from ``alpha_init`` (or U[0,1) like the reference when None) and clipped
    to [0, 1] in the forward pass; ``alpha=1`` is (approximately) the
    identity, ``alpha=0`` zeroes k-space.
    """

    alpha_init: float | None = None
    tau: float = 1.0
    hard: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def init_fn(key):
            if self.alpha_init is None:
                return jax.random.uniform(key, (1,))
            return jnp.asarray([min(max(self.alpha_init, 0.0), 1.0)], jnp.float32)

        alpha = self.param("alpha", init_fn)
        alpha = jnp.clip(alpha[0], 0.0, 1.0)
        n_dims = x.ndim - 2  # (B, C, *spatial)
        spatial = x.shape[-n_dims:]
        if self.hard:
            mask = reference_gibbs_layer_mask(spatial, alpha)
        else:
            mask = soft_gibbs_mask(spatial, alpha, self.tau)
        k = fft_shifted(x, n_dims)
        return ifft_shifted_real(k * mask.astype(k.real.dtype), n_dims)


class SpikeLayer(nn.Module):
    """Random-spike layer (``stylization_layers.py:143-151``).

    The reference builds a fresh ``RandKSpaceSpikeNoise(prob=1,
    intensity_range=(i, i), channel_wise=False)`` per forward; here one spike
    per sample is drawn on device from the ``"corruption"`` RNG stream.
    When ``learnable=True``, ``intensity`` is a real Flax parameter: the
    written log-magnitude value is smooth in it, so it trains by plain
    ``jax.grad`` — the reference could only move it by finite differences
    (``spikes11_layer_domain_GD.py:262-277``).
    """

    intensity: float = 15.0
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.learnable:
            intensity = self.param(
                "intensity",
                lambda _: jnp.asarray([self.intensity], jnp.float32))[0]
        else:
            intensity = self.intensity
        key = self.make_rng("corruption")
        n_dims = x.ndim - 2
        keys = jax.random.split(key, x.shape[0])

        def one(v, k):
            return kspace_spike_random(v, k, (intensity, intensity),
                                       channel_wise=False, n_dims=n_dims)

        return jax.vmap(one)(x, keys)


class GibbsUNet(nn.Module):
    """Gibbs layer -> 3D ResUNet(1->1) (``stylization_layers.py:119-139``).

    Note: the reference's ``Gibbs_UNet.__init__`` ignores its ``alpha``
    argument and hard-codes 0.5 (its line 125); experiment scripts re-define
    a fixed version. Here ``alpha_init`` is honored.
    """

    alpha_init: float | None = 0.5
    tau: float = 1.0
    hard: bool = False
    out_channels: int = 1
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = GibbsNoiseLayer(self.alpha_init, self.tau, self.hard, name="gibbs")(x)
        x = jnp.moveaxis(x, 1, -1)
        x = UNet(self.out_channels, self.channels, self.strides,
                 self.num_res_units, name="unet")(x)
        return jnp.moveaxis(x, -1, 1)


class SpikesUNet(nn.Module):
    """Spike layer -> 3D ResUNet(1->1) (``stylization_layers.py:154-173``)."""

    intensity: float = 15.0
    learnable: bool = True
    out_channels: int = 1
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SpikeLayer(self.intensity, self.learnable, name="spike")(x)
        x = jnp.moveaxis(x, 1, -1)
        x = UNet(self.out_channels, self.channels, self.strides,
                 self.num_res_units, name="unet")(x)
        return jnp.moveaxis(x, -1, 1)


# Reference-name aliases
Gibbs_UNet = GibbsUNet
Spikes_UNet = SpikesUNet
spike_layer = SpikeLayer
