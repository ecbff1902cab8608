"""Dice metric + evaluation/sweep harness."""

from mvtb_tpu.eval.dice import dice_metric, dice_scores, threshold_predictions
from mvtb_tpu.eval.harness import ModelEvaluation, TransformSweep

__all__ = ["dice_metric", "dice_scores", "threshold_predictions",
           "ModelEvaluation", "TransformSweep"]
