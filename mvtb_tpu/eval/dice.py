"""NaN-aware Dice metric (MONAI ``DiceMetric(include_background=True,
reduction="mean")`` semantics, as consumed by ``source_code/utils.py:313-415``
and the training scripts' eval loops).

A (sample, class) pair where prediction and ground truth are both empty has
undefined Dice -> NaN; means count only defined entries, and the defined
count is returned so callers can do the reference's
``sum(metric * not_nans) / sum(not_nans)`` accumulation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def dice_scores(y_pred: Array, y: Array) -> Array:
    """Per-(batch, channel) hard Dice of binarized channel-last inputs.

    ``2|X∩Y| / (|X|+|Y|)``; NaN where the denominator is zero.
    Shapes: ``(B, *spatial, C)`` -> ``(B, C)``.
    """
    spatial_axes = tuple(range(1, y_pred.ndim - 1))
    intersection = jnp.sum(y_pred * y, axis=spatial_axes)
    denom = jnp.sum(y_pred, axis=spatial_axes) + jnp.sum(y, axis=spatial_axes)
    return jnp.where(denom > 0, 2.0 * intersection / denom, jnp.nan)


def dice_metric(y_pred: Array, y: Array) -> Tuple[Array, Array]:
    """Mean Dice over defined entries + count of defined entries.

    Returns ``(mean, not_nans)`` exactly as the reference's per-batch
    ``dice_metric(y_pred, y)`` call does.
    """
    f = dice_scores(y_pred, y)
    finite = jnp.isfinite(f)
    not_nans = jnp.sum(finite)
    total = jnp.sum(jnp.where(finite, f, 0.0))
    mean = jnp.where(not_nans > 0, total / not_nans, jnp.nan)
    return mean, not_nans


def threshold_predictions(logits: Array, threshold: float = 0.5) -> Array:
    """``Activations(sigmoid=True)`` + ``AsDiscrete(threshold_values=True)``:
    sigmoid then binarize at 0.5 — equivalent to ``logits >= 0`` but kept in
    the sigmoid form for clarity/parity."""
    probs = 1.0 / (1.0 + jnp.exp(-logits))
    return (probs >= threshold).astype(logits.dtype)
