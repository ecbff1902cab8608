"""Utilities: profiling, step timing."""

from mvtb_tpu.utils.profiling import StepTimer, trace

__all__ = ["StepTimer", "trace"]

import numpy as _np


def set_determinism(seed: int = 0):
    """Seed host-side randomness (the reference's ``set_determinism(seed=0)``,
    ``baseline.py:70``) and return a JAX root key for device-side streams.

    Transforms that carry their own ``R`` states should additionally be
    seeded via ``set_random_state`` / ``Compose.set_random_state``.
    """
    import random

    import jax as _jax

    random.seed(seed)
    _np.random.seed(seed)
    return _jax.random.key(seed)


__all__ += ["set_determinism"]
