"""Jitted segmentation training: 3D ResUNet + Dice loss + on-device k-space
augmentation, compiled end-to-end.

Replaces the reference's T1/T2 training-script templates
(``10_scripts/20_Gibbs_filters/baseline.py:232-318`` hot loop): the corruption
that the reference ran per-sample on CPU dataloader workers runs here inside
the jitted step on the TPU (``mvtb_tpu.ops.fused.stylize_batch``), fused with
the UNet forward/backward. Optimizer matches ``baseline.py:209-210``:
Adam(1e-4, amsgrad) with torch-style L2 weight decay 1e-5.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from mvtb_tpu.eval.dice import dice_scores, threshold_predictions
from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch
from mvtb_tpu.train.losses import dice_loss

Array = jnp.ndarray


class TrainState(train_state.TrainState):
    """Flax TrainState; ``apply_fn`` is the model's apply."""


def reference_optimizer(lr: float = 1e-4, weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """Adam(lr, amsgrad=True) with coupled (torch-style) L2 weight decay."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.amsgrad(lr),
    )


def create_seg_state(key: jax.Array, model, input_shape: Tuple[int, ...],
                     tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    """Initialize a channel-last UNet train state.

    ``input_shape`` is channel-last ``(B, *spatial, C)``.
    """
    # jit the init: eager init dispatches hundreds of individually-compiled
    # ops, which is pathological over a remote-TPU tunnel.
    variables = jax.jit(model.init)(key, jnp.zeros(input_shape, jnp.float32))
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=tx or reference_optimizer())


@partial(jax.jit, static_argnames=("stylize_cfg", "augment_label", "remat"),
         donate_argnums=(0,))
def seg_train_step(state: TrainState, image: Array, label: Array,
                   key: jax.Array,
                   stylize_cfg: Optional[StylizeConfig] = None,
                   augment_label: bool = False,
                   remat: bool = False) -> Tuple[TrainState, Array]:
    """One fwd+bwd+update step.

    The incoming ``state`` is DONATED: XLA updates the 4.8M-param train state
    (params + Adam moments) in place instead of allocating a fresh copy per
    step — the TPU analogue of the reference's in-place ``optimizer.step()``
    (``baseline.py:232-248``). Callers must rebind (``state, loss =
    seg_train_step(state, ...)``) and may not read the old state afterwards.

    Args:
        image/label: channel-first ``(B, C, *spatial)`` (reference layout).
        key: per-step PRNG key driving the on-device corruption.
        stylize_cfg: fused augmentation config applied to the image (and the
            label too when ``augment_label``, for co-stylized experiments).

        remat: rematerialize the forward in the backward pass
            (``jax.checkpoint``) — trades one extra forward for dropping
            stored activations; a memory knob for full-volume (no-crop)
            training where the activation footprint dominates. Measured
            LOSING at the reference crop size (RESULTS.md round-3), so
            off by default.

    Returns:
        (new_state, scalar dice loss).
    """
    if stylize_cfg is not None and stylize_cfg.any_enabled:
        k_img, k_lbl = jax.random.split(key)
        image = stylize_batch(image, k_img, stylize_cfg)
        if augment_label:
            label = stylize_batch(label, k_lbl, stylize_cfg)

    img_cl = jnp.moveaxis(image, 1, -1)
    lbl_cl = jnp.moveaxis(label, 1, -1)

    fwd = state.apply_fn
    if remat:
        fwd = jax.checkpoint(state.apply_fn)

    def loss_fn(params):
        logits = fwd({"params": params}, img_cl)
        return dice_loss(logits, lbl_cl)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


@partial(jax.jit, static_argnames=("stylize_cfg",))
def seg_eval_step(state: TrainState, image: Array, label: Array,
                  key: Optional[jax.Array] = None,
                  stylize_cfg: Optional[StylizeConfig] = None) -> Array:
    """Per-(sample, class) hard Dice on a batch; NaN where undefined.

    ``stylize_cfg`` lets evaluation corrupt on device (the reference's
    corrupted validation pipelines). Returns shape ``(B, C)``.
    """
    if stylize_cfg is not None and stylize_cfg.any_enabled:
        image = stylize_batch(image, key, stylize_cfg)
    img_cl = jnp.moveaxis(image, 1, -1)
    lbl_cl = jnp.moveaxis(label, 1, -1)
    logits = state.apply_fn({"params": state.params}, img_cl)
    preds = threshold_predictions(logits)
    return dice_scores(preds, lbl_cl)


@dataclasses.dataclass
class EpochMetrics:
    """Reference-style nan-weighted accumulators for mean/per-class Dice
    (``baseline.py:258-310``)."""

    sums: Any = None
    counts: Any = None

    def update(self, scores) -> None:
        import numpy as np

        scores = np.asarray(scores)  # (B, C)
        finite = np.isfinite(scores)
        per_class_sum = np.where(finite, scores, 0.0).sum(axis=0)
        per_class_cnt = finite.sum(axis=0)
        overall = np.nanmean(scores, axis=1)  # per-sample mean over classes
        o_finite = np.isfinite(overall)
        row = np.concatenate([[np.where(o_finite, overall, 0.0).sum()], per_class_sum])
        cnt = np.concatenate([[o_finite.sum()], per_class_cnt])
        if self.sums is None:
            self.sums, self.counts = row, cnt
        else:
            self.sums = self.sums + row
            self.counts = self.counts + cnt

    def result(self):
        import numpy as np

        with np.errstate(invalid="ignore", divide="ignore"):
            vals = self.sums / self.counts
        return {"mean": float(vals[0]),
                "per_class": [float(v) for v in vals[1:]]}


def train_segmentation(state: TrainState, data_iter, num_steps: int,
                       key: jax.Array,
                       stylize_cfg: Optional[StylizeConfig] = None,
                       log_every: int = 0,
                       log_fn: Callable[[str], None] = print):
    """Simple host loop driving :func:`seg_train_step` (library convenience;
    the experiments runner builds richer loops)."""
    losses = []
    for step in range(num_steps):
        image, label = next(data_iter)
        key, sub = jax.random.split(key)
        state, loss = seg_train_step(state, image, label, sub, stylize_cfg)
        losses.append(loss)
        if log_every and (step + 1) % log_every == 0:
            log_fn(f"step {step + 1}/{num_steps} loss {float(loss):.4f}")
    return state, [float(l) for l in losses]
