"""Import-path shim: ``filters_and_operators`` as the reference scripts use it.

Experiment scripts in the reference do ``sys.path.append(SOURCE_CODE_PATH)``
then ``from filters_and_operators import ...`` (``baseline.py:60-66``). Add
``mvtb_tpu/compat`` to ``sys.path`` (or import this module) and those imports
resolve against this framework with the same class names and constructor
signatures. Also provides the reference's lower-level class-style helpers
(``disk_mask``, ``ellipsoid``, ``Fourier``) as thin wrappers over the
functional ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mvtb_tpu import ops
from mvtb_tpu.transforms import (  # noqa: F401 — re-exported API surface
    Compose,
    ConvertToMultiChannelBasedOnBratsClassesd,
    GibbsNoise,
    KSpaceSpikeNoise,
    MapTransform,
    RandFourierDiskMaskd,
    RandGibbsNoise,
    RandGibbsNoised,
    RandKSpaceSpikeNoise,
    RandKSpaceSpikeNoised,
    RandPlaneWaves_ellipsoid,
    Randomizable,
    RandomizableTransform,
    SaltAndPepper,
    SegmentationSlicesd,
    SelectChanneld,
    Transform,
    WholeTumorTCGA,
    WrapArtifact,
    WrapArtifactd,
    ensure_tuple,
)


class Fourier:
    """Static centered-FFT helpers (reference ``Fourier`` mixin API)."""

    @staticmethod
    def shift_fourier(x, n_dims: int):
        return ops.fft_shifted(jnp.asarray(np.asarray(x)), n_dims)

    @staticmethod
    def inv_shift_fourier(k, n_dims: int):
        return ops.ifft_shifted_real(jnp.asarray(k), n_dims)


class disk_mask:
    """Object-style disk mask (reference API: build from a k tensor, then
    ``.apply``). Prefer :func:`mvtb_tpu.ops.disk_mask` in new code."""

    def __init__(self, k_tensor, r: float = 2, dim: int = 2, inside_off=True):
        self.r = r
        self.dim = dim
        self.inside_off = inside_off
        self.last_dims = k_tensor.shape[-1]
        spatial = k_tensor.shape[-dim:]
        mask = np.asarray(ops.disk_mask(spatial, r, inside_off))
        self.binary_mask = np.broadcast_to(mask, k_tensor.shape)

    def apply(self, k_tensor):
        assert k_tensor.shape[-1] == self.last_dims, (
            f"Last dimension of input must be = {self.last_dims}")
        return jnp.asarray(k_tensor) * jnp.asarray(self.binary_mask,
                                                   jnp.asarray(k_tensor).real.dtype)


class ellipsoid(Randomizable):
    """Object-style ellipsoid shell sampler (reference API)."""

    def __init__(self, a: float, b: float, c: float):
        self.a, self.b, self.c = a, b, c

    def binary_mask_3d(self, k_tensor):
        spatial = k_tensor.shape[-3:]
        mask = ops.ellipsoid_shell_mask(spatial, self.a, self.b, self.c)
        return np.broadcast_to(mask.astype(np.float32), k_tensor.shape)

    def sample_ellipsoid(self, k_tensor):
        return ops.sample_ellipsoid(k_tensor.shape[-3:], self.a, self.b,
                                    self.c, rng=self.R)
