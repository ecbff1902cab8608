"""Synthetic BraTS-like data: smooth multi-channel "MRI" volumes with blob
tumors and nested 3-class labels (TC ⊂ WT, ET ⊂ TC — the label topology of
``ConvertToMultiChannelBasedOnBratsClassesd``).

Serves as the test/smoke/bench vehicle (the reference's datasets live on a
private cluster; SURVEY.md section 6) and as the input generator for the
experiments runner when no real dataset root is configured.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def _smooth_noise(rng: np.random.RandomState, shape, passes: int = 2) -> np.ndarray:
    """Cheap separable box-smoothing of white noise (no scipy dependency)."""
    x = rng.randn(*shape).astype(np.float32)
    for _ in range(passes):
        for ax in range(x.ndim):
            x = (x + np.roll(x, 1, ax) + np.roll(x, -1, ax)) / 3.0
    return x


def make_volume(rng: np.random.RandomState, channels: int = 4,
                spatial: Tuple[int, ...] = (128, 128, 64),
                n_classes: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """One sample: (image (C, *spatial) float32 ~ N(0,1)ish, label one-hot
    (n_classes, *spatial) float32 with nested tumor regions)."""
    grids = np.ogrid[tuple(slice(0, n) for n in spatial)]
    center = [rng.uniform(0.3, 0.7) * n for n in spatial]
    radii = [rng.uniform(0.10, 0.22) * n for n in spatial]
    q = sum(((g - c) / r) ** 2 for g, c, r in zip(grids, center, radii))
    wt = q < 1.0
    tc = q < 0.55
    et = q < 0.25

    image = np.stack([
        _smooth_noise(rng, spatial) + 1.5 * wt.astype(np.float32) * (0.5 + 0.5 * rng.rand())
        for _ in range(channels)
    ])
    image = (image - image.mean(axis=tuple(range(1, image.ndim)), keepdims=True)) / (
        image.std(axis=tuple(range(1, image.ndim)), keepdims=True) + 1e-6
    )
    if n_classes == 3:
        label = np.stack([tc, wt, et]).astype(np.float32)
    elif n_classes == 1:
        label = wt[None].astype(np.float32)
    else:
        raise ValueError("n_classes must be 1 or 3")
    return image.astype(np.float32), label


def batches(seed: int, batch_size: int, channels: int = 4,
            spatial: Tuple[int, ...] = (128, 128, 64),
            n_classes: int = 3) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless iterator of (image, label) channel-first batches."""
    rng = np.random.RandomState(seed)
    while True:
        imgs, lbls = zip(*[make_volume(rng, channels, spatial, n_classes)
                           for _ in range(batch_size)])
        yield np.stack(imgs), np.stack(lbls)


def cached_batches(seed: int, batch_size: int, pool: int = 32,
                   channels: int = 4, spatial: Tuple[int, ...] = (128, 128, 64),
                   n_classes: int = 3) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless batches sampled from a pre-generated in-memory pool.

    The analogue of the reference's ``CacheDataset``: volume synthesis (like
    its NIfTI decode + preprocessing) is paid once, so a 1-core host can feed
    the TPU at step rate.
    """
    rng = np.random.RandomState(seed)
    volumes = [make_volume(rng, channels, spatial, n_classes)
               for _ in range(pool)]
    while True:
        idx = rng.randint(0, pool, batch_size)
        yield (np.stack([volumes[i][0] for i in idx]),
               np.stack([volumes[i][1] for i in idx]))


def decathlon_style_dicts(seed: int, n: int, channels: int = 4,
                          spatial: Tuple[int, ...] = (128, 128, 64),
                          n_classes: int = 3):
    """A list of ``{"image", "label"}`` dicts for transform-pipeline testing."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        img, lbl = make_volume(rng, channels, spatial, n_classes)
        out.append({"image": img, "label": lbl})
    return out
