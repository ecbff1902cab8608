"""``monai.metrics.DiceMetric`` facade over :mod:`mvtb_tpu.eval.dice`.

Matches the MONAI 0.4 call convention the reference uses
(``baseline.py:261,277-301``): ``value, not_nans = dice_metric(y_pred=...,
y=...)`` with nan-aware mean over defined (sample, class) entries.
"""

from __future__ import annotations

import numpy as np


class _Scalar(float):
    def item(self) -> float:
        return float(self)


class DiceMetric:
    def __init__(self, include_background: bool = True,
                 reduction: str = "mean", **_ignored):
        if not include_background:
            raise NotImplementedError(
                "the reference always uses include_background=True")
        self.reduction = reduction

    def __call__(self, y_pred, y):
        import jax.numpy as jnp

        from mvtb_tpu.eval.dice import dice_metric, dice_scores

        pred = jnp.moveaxis(jnp.asarray(np.asarray(y_pred)), 1, -1)
        tgt = jnp.moveaxis(jnp.asarray(np.asarray(y)), 1, -1)
        if self.reduction in ("mean", "mean_batch"):
            mean, not_nans = dice_metric(pred, tgt)
            return _Scalar(float(mean)), _Scalar(float(not_nans))
        if self.reduction == "none":
            return np.asarray(dice_scores(pred, tgt)), None
        raise NotImplementedError(self.reduction)
