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


def enable_compilation_cache(path: str = "/tmp/mvtb_jax_cache") -> None:
    """Persistent XLA compilation cache: identical programs (by HLO hash)
    skip recompilation across processes — valuable on this machine, where
    remote TPU compiles can take minutes under load."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ += ["enable_compilation_cache"]
