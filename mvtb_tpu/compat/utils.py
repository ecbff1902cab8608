"""Import-path shim: ``utils`` module name for reference scripts/notebooks.

Maps the reference's ``source_code/utils.py`` surface (ReCompose, display
helpers, evaluation harness) to framework equivalents. Display functions are
provided when matplotlib is importable and degrade to no-ops otherwise.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

from mvtb_tpu.eval.harness import ModelEvaluation as model_evaluation  # noqa: F401
from mvtb_tpu.data.brats_sweep import BratsValIterDataset  # noqa: F401
from mvtb_tpu.eval.harness import TransformSweep  # noqa: F401
from mvtb_tpu.transforms import ReCompose  # noqa: F401


def WL_to_LH(window: float, level: float) -> Tuple[float, float]:
    """Window/level to low/high display bounds (``utils.py:69-73``)."""
    return level - window / 2, level + window / 2


def show(img, k_space: bool = True) -> None:
    """Display an (optionally k-space log-magnitude) image (``utils.py:52-66``)."""
    import matplotlib.pyplot as plt

    img = np.asarray(img).copy()
    if k_space:
        img = np.log(np.abs(img))
    lo, hi = img.min(), img.max()
    img = (img - lo) / (hi - lo + 1e-5)
    if img.ndim == 3:
        plt.imshow(np.moveaxis(img, 0, -1))
    elif img.ndim == 2:
        plt.imshow(img)


def show_slice_and_fourier(img_2d, level: Union[int, float, None] = None,
                           window: Union[int, float, None] = None,
                           level_f: Union[int, float, None] = None,
                           window_f: Union[int, float, None] = None,
                           title: str = None) -> None:
    """Side-by-side image + log-|FFT| display (``utils.py:76-127``)."""
    import matplotlib.pyplot as plt

    img = np.asarray(img_2d)
    assert img.ndim == 2, "Input tensor must have 2 dims"
    if window is None:
        window = img.max() - img.min()
    if level is None:
        level = window / 2 + img.min()
    low, high = WL_to_LH(window, level)

    plt.figure(figsize=(15, 6))
    plt.suptitle(title or "Image slice and k-space slice")
    plt.subplot(1, 2, 1)
    plt.imshow(img, cmap="gray", vmin=low, vmax=high,
               interpolation="bilinear", origin="lower")
    plt.colorbar()

    k = np.fft.fftshift(np.fft.fft2(img), axes=(-2, -1))
    k = np.log(np.abs(k))
    if np.isneginf(k.min()):
        k[np.isneginf(k)] = 0
    if window_f is None:
        window_f = k.max() - k.min()
    if level_f is None:
        level_f = window_f / 2 + k.min()
    low_f, high_f = WL_to_LH(window_f, level_f)
    plt.subplot(1, 2, 2)
    plt.imshow(k, cmap="gray", vmin=low_f, vmax=high_f,
               interpolation="bilinear", origin="lower")
    plt.colorbar()
    plt.show()
