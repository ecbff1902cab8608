"""Evaluation harness: the reference's ``model_evaluation`` + sweep pattern.

``ModelEvaluation`` accumulates Dice metrics per named dataset
(``source_code/utils.py:241-465``): ``dataset_eval_single`` for 1-label
models, ``dataset_eval_multi`` for the 3-label BraTS head returning
``(mean, ET, TC, WT)`` with the reference's nan-weighted accumulation and
channel order (TC=ch0, WT=ch1, ET=ch2). Results persist as JSON (and
pickle for drop-in parity with the reference's ``.pickle`` tables).

``TransformSweep`` is the ``BratsValIterDataset`` analogue: a fixed base
dataset x a dict of named corruption transforms, yielding ``(name, loader)``.
"""

from __future__ import annotations

import json
import pickle
from collections import defaultdict
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.eval.dice import dice_metric, threshold_predictions


from functools import partial


@partial(jax.jit, static_argnums=0)
def _forward_batch(apply_fn, params, image_cf):
    img_cl = jnp.moveaxis(jnp.asarray(image_cf), 1, -1)
    logits = apply_fn({"params": params}, img_cl)
    return logits  # channel-last


@jax.jit
def _eval_batch(logits, label_cl):
    preds = threshold_predictions(logits)
    overall = dice_metric(preds, label_cl)
    per_class = [dice_metric(preds[..., c:c + 1], label_cl[..., c:c + 1])
                 for c in range(label_cl.shape[-1])]
    return overall, per_class


class ModelEvaluation:
    """Dice evaluation record for one model across many datasets.

    Args:
        apply_fn/params: the model's apply and parameters (in place of the
            reference's ``.pth`` loading; use ``from_checkpoint`` to restore
            from an Orbax directory).
        instance_name: label used for the saved results file.
        out_channels: 3 -> multi-label (mean, ET, TC, WT); 1 -> scalar Dice.
    """

    def __init__(self, apply_fn: Optional[Callable] = None, params=None,
                 instance_name: Optional[str] = None, in_channels: int = 4,
                 out_channels: int = 3,
                 roi_size: Optional[Tuple[int, ...]] = None):
        self.apply_fn = apply_fn
        self.params = params
        self.instance_name = instance_name
        self.in_channels = in_channels
        self.out_channels = out_channels
        # roi_size -> evaluate via sliding-window inference (the reference's
        # TCGA_data_augmentation notebook pattern)
        self.roi_size = tuple(roi_size) if roi_size else None
        self.eval_dict: Dict[str, object] = defaultdict(list)

    def _forward(self, image_cf):
        if self.roi_size is not None:
            from mvtb_tpu.eval.sliding_window import sliding_window_inference

            logits_cf = sliding_window_inference(
                jnp.asarray(image_cf), self.roi_size, self.apply_fn,
                self.params)
            return jnp.moveaxis(logits_cf, 1, -1)
        return _forward_batch(self.apply_fn, self.params, image_cf)

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, instance_name: Optional[str] = None,
                        in_channels: int = 4, out_channels: int = 3,
                        gibbs_unet: bool = False, spikes_unet: bool = False,
                        step: Optional[int] = None) -> "ModelEvaluation":
        """Restore a trained model from an Orbax checkpoint directory.

        The framework analogue of the reference's ``load_UNet`` /
        ``load_gibbs_unet`` / ``load_spikes_unet`` .pth loading
        (``utils.py:286-311``). Channel-first stylization models
        (``gibbs_unet``/``spikes_unet``) are wrapped so the harness's
        channel-last forward sees a plain UNet interface.
        """
        from mvtb_tpu.models import GibbsUNet, SpikesUNet, UNet
        from mvtb_tpu.train.checkpoint import CheckpointManager
        from mvtb_tpu.train.seg import TrainState, reference_optimizer

        if gibbs_unet:
            model = GibbsUNet(out_channels=out_channels)
        elif spikes_unet:
            model = SpikesUNet(out_channels=out_channels)
        else:
            model = UNet(out_channels=out_channels)

        # param shapes are spatial-size independent; init on a minimal grid
        tiny = (1, 16, 16, 16, in_channels)
        if gibbs_unet or spikes_unet:
            tiny = (1, in_channels, 16, 16, 16)
            rngs = {"params": jax.random.key(0),
                    "corruption": jax.random.key(1)}
            variables = jax.jit(model.init)(rngs, jnp.zeros(tiny, jnp.float32))
        else:
            variables = jax.jit(model.init)(jax.random.key(0),
                                            jnp.zeros(tiny, jnp.float32))
        template = TrainState.create(apply_fn=model.apply,
                                     params=variables["params"],
                                     tx=reference_optimizer())
        mgr = CheckpointManager(ckpt_dir)
        state = mgr.restore(template, step=step)
        mgr.close()

        if gibbs_unet or spikes_unet:
            base_apply = model.apply

            def apply_fn(vars_, x_cl, _base=base_apply):
                # harness supplies channel-last; stylization models are
                # channel-first and (spikes) need a corruption stream
                x_cf = jnp.moveaxis(x_cl, -1, 1)
                y = _base(vars_, x_cf, rngs={"corruption": jax.random.key(0)})
                return jnp.moveaxis(y, 1, -1)
        else:
            apply_fn = model.apply
        return cls(apply_fn, state.params, instance_name=instance_name,
                   in_channels=in_channels, out_channels=out_channels)

    # -- dataset-level metrics ------------------------------------------------

    def dataset_eval_single(self, loader: Iterable[dict]) -> float:
        metric_sum, metric_count = 0.0, 0.0
        for batch in loader:
            logits = self._forward(batch["image"])
            lbl = jnp.moveaxis(jnp.asarray(batch["label"]), 1, -1)
            (value, not_nans), _ = _eval_batch(logits, lbl)
            metric_sum += float(value) * float(not_nans)
            metric_count += float(not_nans)
        return metric_sum / metric_count

    def dataset_eval_multi(self, loader: Iterable[dict]) -> Tuple[float, float, float, float]:
        sums = np.zeros(4)
        counts = np.zeros(4)
        for batch in loader:
            logits = self._forward(batch["image"])
            lbl = jnp.moveaxis(jnp.asarray(batch["label"]), 1, -1)
            (value, not_nans), per_class = _eval_batch(logits, lbl)
            sums[0] += float(value) * float(not_nans)
            counts[0] += float(not_nans)
            for i, (v, n) in enumerate(per_class):  # channels: TC, WT, ET
                sums[1 + i] += float(v) * float(n)
                counts[1 + i] += float(n)
        metric, metric_tc, metric_wt, metric_et = sums / counts
        # reference return order: (mean, ET, TC, WT) (utils.py:415)
        return metric, metric_et, metric_tc, metric_wt

    def add_eval(self, name: Optional[str] = None, test_loader=None,
                 data_dict: Optional[dict] = None) -> None:
        eval_fn = (self.dataset_eval_multi if self.out_channels > 1
                   else self.dataset_eval_single)
        if data_dict is None:
            self.eval_dict[name] = eval_fn(test_loader)
        else:
            for key in data_dict:
                self.eval_dict[key] = eval_fn(data_dict[key])

    # -- persistence ----------------------------------------------------------

    def save(self, path: Optional[str] = None) -> str:
        """JSON (+pickle sidecar) of the eval record, model stripped."""
        base = path or self.instance_name or "model_evaluation"
        record = {
            "instance_name": self.instance_name,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "eval_dict": {k: (list(v) if isinstance(v, (tuple, list)) else v)
                          for k, v in self.eval_dict.items()},
        }
        with open(base + ".json", "w") as f:
            json.dump(record, f, indent=2)
        with open(base + ".pickle", "wb") as f:
            pickle.dump(record, f)
        return base + ".json"

    def load_dict(self, filename: str) -> None:
        if filename.endswith(".pickle"):
            with open(filename, "rb") as f:
                record = pickle.load(f)
        else:
            with open(filename) as f:
                record = json.load(f)
        self.instance_name = record.get("instance_name", self.instance_name)
        self.eval_dict = defaultdict(list, record["eval_dict"])


class TransformSweep:
    """Named-corruption sweep over a fixed validation set
    (``BratsValIterDataset``, ``source_code/utils.py:159-235``).

    Args:
        samples: list of ``{"image", "label"}`` channel-first dicts — the
            preprocessed validation split.
        transforms: ``{name: dict-transform}``; each is appended to the (al-
            ready applied) base pipeline, i.e. applied to ``samples`` lazily.
        batch_size: loader batch size (reference uses 2).
    """

    def __init__(self, samples: List[dict], transforms: Dict[str, Callable],
                 batch_size: int = 2):
        self.samples = samples
        self.transforms = transforms
        self.batch_size = batch_size

    def _loader(self, transform) -> Iterator[dict]:
        batch_imgs, batch_lbls = [], []
        for s in self.samples:
            out = transform(dict(s)) if transform is not None else s
            batch_imgs.append(np.asarray(out["image"]))
            batch_lbls.append(np.asarray(out["label"]))
            if len(batch_imgs) == self.batch_size:
                yield {"image": np.stack(batch_imgs), "label": np.stack(batch_lbls)}
                batch_imgs, batch_lbls = [], []
        if batch_imgs:
            yield {"image": np.stack(batch_imgs), "label": np.stack(batch_lbls)}

    def __iter__(self) -> Iterator[Tuple[str, Iterator[dict]]]:
        for name, t in self.transforms.items():
            yield name, self._loader(t)

    def __getitem__(self, key: str) -> Iterator[dict]:
        return self._loader(self.transforms[key])
