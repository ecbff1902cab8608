"""Dice loss/metric parity: against hand-computed values and the torch
formulation of MONAI's defaults."""

import jax.numpy as jnp
import numpy as np
import torch

from mvtb_tpu.eval.dice import dice_metric, dice_scores, threshold_predictions
from mvtb_tpu.train.losses import bce_with_logits, dice_loss, mse


def _torch_dice_loss(logits, targets, smooth=1e-5):
    """MONAI DiceLoss(sigmoid=True, squared_pred=True) — independent impl."""
    pred = torch.sigmoid(logits)
    dims = tuple(range(1, logits.dim() - 1))
    inter = (targets * pred).sum(dim=dims)
    denom = (targets ** 2).sum(dim=dims) + (pred ** 2).sum(dim=dims)
    return (1 - (2 * inter + smooth) / (denom + smooth)).mean()


def test_dice_loss_matches_torch_reference():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 4, 3).astype(np.float32)
    targets = (rng.rand(2, 8, 8, 4, 3) > 0.5).astype(np.float32)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(_torch_dice_loss(torch.from_numpy(logits),
                                  torch.from_numpy(targets)))
    assert abs(got - want) < 1e-5


def test_dice_loss_perfect_prediction_is_small():
    targets = np.zeros((1, 8, 8, 1), np.float32)
    targets[0, 2:6, 2:6, 0] = 1.0
    logits = np.where(targets > 0, 20.0, -20.0).astype(np.float32)
    assert float(dice_loss(jnp.asarray(logits), jnp.asarray(targets))) < 1e-3


def test_dice_scores_hand_computed():
    pred = np.zeros((1, 4, 4, 1), np.float32)
    true = np.zeros((1, 4, 4, 1), np.float32)
    pred[0, :2, :2, 0] = 1  # 4 voxels
    true[0, :2, :3, 0] = 1  # 6 voxels, overlap 4
    f = np.asarray(dice_scores(jnp.asarray(pred), jnp.asarray(true)))
    assert abs(f[0, 0] - 2 * 4 / (4 + 6)) < 1e-6


def test_dice_metric_nan_handling():
    pred = np.zeros((2, 4, 4, 2), np.float32)
    true = np.zeros((2, 4, 4, 2), np.float32)
    pred[0, 0, 0, 0] = true[0, 0, 0, 0] = 1.0  # one defined entry, dice 1
    mean, not_nans = dice_metric(jnp.asarray(pred), jnp.asarray(true))
    assert float(not_nans) == 1
    assert float(mean) == 1.0


def test_threshold_predictions_is_sigmoid_then_half():
    logits = jnp.asarray([-1.0, -1e-4, 0.0, 1e-4, 3.0])
    out = np.asarray(threshold_predictions(logits))
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 1])


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 5).astype(np.float32)
    labels = (rng.rand(4, 5) > 0.5).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(got - want) < 1e-6


def test_mse_matches_torch():
    rng = np.random.RandomState(2)
    a = rng.randn(3, 4).astype(np.float32)
    b = rng.randn(3, 4).astype(np.float32)
    got = float(mse(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch.nn.functional.mse_loss(torch.from_numpy(a),
                                              torch.from_numpy(b)))
    assert abs(got - want) < 1e-6
