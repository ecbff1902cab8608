"""``monai.utils`` names: set_determinism, NumpyPadMode."""

from __future__ import annotations

import enum
import random

import numpy as np


def set_determinism(seed: int = 0, additional_settings=None) -> None:
    """Seed every RNG a reference script draws from (``baseline.py:70``):
    python ``random``, global numpy (DataLoader shuffles), torch when
    importable (the 48/48 ``random_split`` generator is seeded separately by
    the scripts), and the framework's shared ``Randomizable`` default
    stream."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:  # pragma: no cover
        pass
    from mvtb_tpu.transforms.base import Randomizable

    Randomizable.R = np.random.RandomState(seed % (2 ** 32))
    if additional_settings is not None:
        for fn in np.atleast_1d(additional_settings):
            fn(seed)


class NumpyPadMode(enum.Enum):
    """Subset of MONAI's pad-mode enum used by the GAN data modules."""

    CONSTANT = "constant"
    EDGE = "edge"
    REFLECT = "reflect"
    WRAP = "wrap"

    def __str__(self):  # pragma: no cover - cosmetic
        return self.value
