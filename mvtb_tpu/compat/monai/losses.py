"""``monai.losses.DiceLoss`` facade over :func:`mvtb_tpu.train.losses.dice_loss`.

Forward evaluation is exact (same formula, ``baseline.py:207`` parameters);
``.backward()`` on the returned value is the documented torch-training
boundary — it raises with a pointer to the TPU-native training entry points.
"""

from __future__ import annotations

import numpy as np


class _LossValue(float):
    """Float + the two torch-tensor methods the scripts call on a loss."""

    def item(self) -> float:
        return float(self)

    def backward(self):
        raise RuntimeError(
            "mvtb_tpu monai shim: DiceLoss values are not torch autograd "
            "nodes — the torch training loop is the documented compat "
            "boundary. Run training TPU-native instead: "
            "mvtb_tpu.train.seg.seg_train_step (jitted fwd+bwd+Adam) or the "
            "config-driven runner `python -m mvtb_tpu.experiments <name>`."
        )


class DiceLoss:
    def __init__(self, include_background: bool = True,
                 to_onehot_y: bool = False, sigmoid: bool = False,
                 softmax: bool = False, squared_pred: bool = False,
                 jaccard: bool = False, reduction: str = "mean",
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 batch: bool = False):
        if to_onehot_y or softmax or jaccard or batch or reduction != "mean":
            raise NotImplementedError(
                "DiceLoss shim covers the reference's configuration "
                "(sigmoid/squared_pred/include_background, mean reduction)")
        self.include_background = include_background
        self.sigmoid = sigmoid
        self.squared_pred = squared_pred
        self.smooth_nr = smooth_nr
        self.smooth_dr = smooth_dr

    def __call__(self, input, target) -> _LossValue:
        import jax.numpy as jnp

        from mvtb_tpu.train.losses import dice_loss

        pred = jnp.moveaxis(jnp.asarray(np.asarray(input)), 1, -1)
        tgt = jnp.moveaxis(jnp.asarray(np.asarray(target)), 1, -1)
        val = dice_loss(pred, tgt, sigmoid=self.sigmoid,
                        squared_pred=self.squared_pred,
                        smooth_nr=self.smooth_nr, smooth_dr=self.smooth_dr,
                        include_background=self.include_background)
        return _LossValue(float(val))
