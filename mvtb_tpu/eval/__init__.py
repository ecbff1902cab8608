"""Dice metric + evaluation/sweep harness + sliding window + plots."""

from mvtb_tpu.eval.dice import dice_metric, dice_scores, threshold_predictions
from mvtb_tpu.eval.harness import ModelEvaluation, TransformSweep
from mvtb_tpu.eval.sliding_window import (
    make_sliding_window_fn,
    sliding_window_inference,
)

__all__ = ["dice_metric", "dice_scores", "threshold_predictions",
           "ModelEvaluation", "TransformSweep",
           "make_sliding_window_fn", "sliding_window_inference"]
