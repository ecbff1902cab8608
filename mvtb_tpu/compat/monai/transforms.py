"""``monai.transforms`` names, backed by the framework's transform stack.

Covers the union of ``from monai.transforms import (...)`` lists across the
reference's T1/T2 script templates and eval notebooks
(``baseline.py:27-43``, ``baseline_domain.py``,
``20_results/30_planes_waves/compare.py:14-30``).
"""

from __future__ import annotations

import numpy as np

from mvtb_tpu.data.nifti import read_nifti
from mvtb_tpu.data.preprocess import (  # noqa: F401
    AsChannelFirstd,
    CenterSpatialCropd,
    EnsureChannelFirstd,
    NormalizeIntensityd,
    Orientationd,
    RandFlipd,
    RandScaleIntensityd,
    RandShiftIntensityd,
    RandSpatialCropd,
    Spacingd,
)
from mvtb_tpu.data.preprocess import ToTensord as _ToTensord
from mvtb_tpu.transforms.base import (  # noqa: F401
    Compose,
    MapTransform,
    Randomizable,
    RandomizableTransform,
    ReCompose,
    Transform,
)

from ._tensor import ArrayTensor


class LoadImaged(MapTransform):
    """Load NIfTI paths into arrays (``monai.transforms.LoadImaged``).

    The sample dict holds file paths under ``keys`` (as
    ``monai.apps.DecathlonDataset`` yields them); each is replaced by its
    voxel array. The image affine is stored under ``"affine"`` (consumed by
    ``Spacingd``/``Orientationd``) and per-key ``{key}_meta_dict`` entries
    carry MONAI's meta layout for code that reads it.
    """

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            arr, affine = read_nifti(str(d[key]))
            d[key] = arr
            d[f"{key}_meta_dict"] = {"affine": affine,
                                     "original_affine": affine.copy()}
            d.setdefault("affine", affine)
        return d


class AddChanneld(MapTransform):
    """Unconditionally prepend a channel axis (``monai.transforms.AddChanneld``)."""

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = np.asarray(d[key])[None]
        return d


class ToTensord(_ToTensord):
    """numpy-backed tensor facade: arrays gain no-op ``.to(device)`` etc. so
    the reference's ``batch["image"].to(torch.device("cuda:0"))`` lines run
    unchanged on this backend."""

    def __call__(self, data):
        d = super().__call__(data)
        for key in self.key_iterator(d):
            d[key] = np.asarray(d[key]).view(ArrayTensor)
        return d


class Activations:
    """Array post-transform: sigmoid/softmax on channel-first batches
    (``baseline.py:262-264`` post_trans)."""

    def __init__(self, sigmoid: bool = False, softmax: bool = False,
                 other=None):
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.other = other

    def __call__(self, img):
        x = np.asarray(img, dtype=np.float32)
        if self.sigmoid:
            x = 1.0 / (1.0 + np.exp(-x))
        if self.softmax:
            e = np.exp(x - x.max(axis=1, keepdims=True))
            x = e / e.sum(axis=1, keepdims=True)
        if self.other is not None:
            x = self.other(x)
        return x.view(ArrayTensor)


class AsDiscrete:
    """Threshold/argmax discretization. Accepts both the MONAI 0.4/0.5
    spelling (``threshold_values=True, logit_thresh=0.5``) and the modern
    one (``threshold=0.5``)."""

    def __init__(self, argmax: bool = False, to_onehot=None,
                 threshold_values: bool = False, logit_thresh: float = 0.5,
                 threshold=None, n_classes=None):
        self.argmax = argmax
        self.to_onehot = to_onehot if to_onehot not in (False, None) else None
        self.n_classes = n_classes
        if threshold is not None:
            threshold_values, logit_thresh = True, float(threshold)
        self.threshold_values = threshold_values
        self.logit_thresh = logit_thresh

    def __call__(self, img):
        x = np.asarray(img, dtype=np.float32)
        if self.argmax:
            x = np.argmax(x, axis=1, keepdims=True).astype(np.float32)
        if self.to_onehot is not None or self.n_classes is not None:
            n = int(self.to_onehot if self.to_onehot is not None
                    else self.n_classes)
            idx = x.astype(np.int64)
            x = np.moveaxis(np.eye(n, dtype=np.float32)[idx[:, 0]], -1, 1)
        if self.threshold_values:
            x = (x >= self.logit_thresh).astype(np.float32)
        return x.view(ArrayTensor)
