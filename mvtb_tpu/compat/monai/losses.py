"""``monai.losses.DiceLoss`` facade over :func:`mvtb_tpu.train.losses.dice_loss`.

Forward evaluation is exact (same formula, ``baseline.py:207`` parameters).
When the prediction came from the shim's UNet facade, the returned value
carries a grad tape and ``.backward()`` works — it runs jitted
``jax.value_and_grad`` of dice∘forward and populates ``.grad`` on the
facade's torch parameters, so the reference's verbatim training loop
(``baseline.py:232-248``: zero_grad/forward/loss/backward/step) executes
top-to-bottom (see ``networks/nets.py`` grad-bridge docstring). On a plain
array input (no tape), ``.backward()`` still raises with a pointer to the
TPU-native training entry points.
"""

from __future__ import annotations

import numpy as np


class _LossValue(float):
    """Float + the two torch-tensor methods the scripts call on a loss.

    ``_tape`` (set by DiceLoss when the prediction came from the UNet
    facade) holds (model, input, target, loss_cfg) for ``backward()``.
    """

    _tape = None

    def item(self) -> float:
        return float(self)

    def backward(self):
        if self._tape is None:
            raise RuntimeError(
                "mvtb_tpu monai shim: this DiceLoss value has no grad tape "
                "(the prediction did not come from the shim UNet facade). "
                "Run training TPU-native instead: "
                "mvtb_tpu.train.seg.seg_train_step (jitted fwd+bwd+Adam) or "
                "the config-driven runner "
                "`python -m mvtb_tpu.experiments <name>`."
            )
        model, x_cf, tgt_cf, cfg = self._tape
        _, grads = model._value_and_grad_fn(cfg)(model._params, x_cf, tgt_cf)
        model._accumulate_torch_grads(grads)


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
        out = _LossValue(float(val))
        model = getattr(input, "_mvtb_model", None)
        if model is not None:
            out._tape = (model, getattr(input, "_mvtb_input"),
                         np.asarray(target, np.float32),
                         (self.sigmoid, self.squared_pred,
                          self.include_background,
                          self.smooth_nr, self.smooth_dr))
        return out
