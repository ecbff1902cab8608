"""Losses: MONAI-equivalent Dice loss and GAN criteria.

DiceLoss matches MONAI's defaults as configured by the reference
(``baseline.py:207``): ``sigmoid=True, squared_pred=True,
include_background=True, smooth_nr=smooth_dr=1e-5``, reduction = mean over
batch and channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

Array = jnp.ndarray


def dice_loss(
    logits: Array,
    targets: Array,
    *,
    sigmoid: bool = True,
    squared_pred: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    include_background: bool = True,
) -> Array:
    """Soft Dice loss over channel-last ``(B, *spatial, C)`` arrays.

    ``1 - (2*intersection + nr) / (sum(p^2) + sum(t^2) + dr)`` per
    (batch, channel), averaged.
    """
    pred = jnp.asarray(logits)
    if sigmoid:
        pred = 1.0 / (1.0 + jnp.exp(-pred))
    if not include_background and pred.shape[-1] > 1:
        pred = pred[..., 1:]
        targets = targets[..., 1:]
    spatial_axes = tuple(range(1, pred.ndim - 1))
    intersection = jnp.sum(targets * pred, axis=spatial_axes)
    if squared_pred:
        denom = jnp.sum(targets ** 2, axis=spatial_axes) + jnp.sum(pred ** 2, axis=spatial_axes)
    else:
        denom = jnp.sum(targets, axis=spatial_axes) + jnp.sum(pred, axis=spatial_axes)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(f)


def bce_with_logits(logits: Array, labels: Array) -> Array:
    """Mean binary cross-entropy on raw logits (torch ``BCEWithLogitsLoss``)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def mse(a: Array, b: Array) -> Array:
    return jnp.mean((a - b) ** 2)
