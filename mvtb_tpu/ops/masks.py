"""k-space mask geometry.

Two distinct center conventions exist in the reference and are preserved here
because they produce *different* masks:

* ``disk_mask`` / ``ellipsoid_shell_mask`` center at ``floor(n/2)`` per axis
  (``source_code/filters_and_operators.py:145-146, 176-178, 329-331``).
* ``gibbs_mask`` centers at ``(n - 1) / 2`` with a float radius derived from
  alpha (``source_code/filters_and_operators.py:689-698``).

Masks with concrete (Python) parameters are built with numpy in float64 —
bit-exact against the CPU reference — and returned as numpy bool/float arrays
that jit treats as constants. Traced-parameter variants (for learnable layers
and on-device random augmentation) are pure jnp.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_concrete(*vals) -> bool:
    return all(isinstance(v, (int, float, np.integer, np.floating)) for v in vals)


# ---------------------------------------------------------------------------
# Disk (circular / spherical) masks — floor(n/2) center, integer grid
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _disk_mask_np(spatial_shape: Tuple[int, ...], r: float, inside_off: bool) -> np.ndarray:
    """Exact boolean disk mask over an integer grid (cached per geometry)."""
    center = [n // 2 for n in spatial_shape]
    grids = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    dist_sq = sum((g - c) ** 2 for g, c in zip(grids, center))
    inside = dist_sq < float(r) ** 2
    mask = ~inside if inside_off else inside
    return mask


def disk_mask(spatial_shape: Sequence[int], r, inside_off: bool = False):
    """Binary disk/ball mask centered at ``floor(n/2)`` of each axis.

    ``inside_off=False`` keeps radius < r (low-pass, the Gibbs-filter setting
    of ``RandFourierDiskMaskd``); ``inside_off=True`` keeps radius >= r
    (high-pass). Works for any dimensionality (the reference supports 2D/3D).

    Returns a float32 numpy array for concrete ``r`` (a jit constant), or a
    traced jnp array when ``r`` is traced.
    """
    spatial_shape = tuple(int(n) for n in spatial_shape)
    if _is_concrete(r):
        return _disk_mask_np(spatial_shape, float(r), bool(inside_off)).astype(np.float32)
    # Traced radius: same geometry with jnp.
    center = [n // 2 for n in spatial_shape]
    dist_sq = _dist_sq_grid(spatial_shape, center)
    inside = dist_sq < jnp.asarray(r, jnp.float32) ** 2
    mask = jnp.logical_not(inside) if inside_off else inside
    return mask.astype(jnp.float32)


def _dist_sq_grid(spatial_shape: Tuple[int, ...], center) -> jnp.ndarray:
    """Squared distance from ``center`` on an integer grid, float32, traced."""
    total = jnp.zeros(spatial_shape, jnp.float32)
    for axis, (n, c) in enumerate(zip(spatial_shape, center)):
        coord = jax.lax.broadcasted_iota(jnp.float32, spatial_shape, axis)
        total = total + (coord - c) ** 2
    return total


# ---------------------------------------------------------------------------
# Gibbs mask — (n-1)/2 center, float64 distance (reference GibbsNoise)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _gibbs_mask_np(spatial_shape: Tuple[int, ...], alpha: float) -> np.ndarray:
    r = (1.0 - alpha) * np.max(spatial_shape) * np.sqrt(2) / 2.0
    center = (np.array(spatial_shape) - 1) / 2
    coords = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    dist = np.sqrt(sum((g - c) ** 2 for g, c in zip(coords, center)))
    return dist <= r


def gibbs_mask(spatial_shape: Sequence[int], alpha):
    """Low-pass mask of ``GibbsNoise``: keep ``dist <= (1-alpha)*max(shape)*sqrt(2)/2``
    from the true center ``(shape-1)/2``. ``alpha=0`` is the identity.

    Concrete ``alpha`` -> exact float64 numpy bool mask (bit-parity with the
    CPU reference); traced ``alpha`` -> jnp float32 path.
    """
    spatial_shape = tuple(int(n) for n in spatial_shape)
    if _is_concrete(alpha):
        return _gibbs_mask_np(spatial_shape, float(alpha))
    center = [(n - 1) / 2 for n in spatial_shape]
    dist = jnp.sqrt(_dist_sq_grid(spatial_shape, center))
    r = (1.0 - jnp.asarray(alpha, jnp.float32)) * max(spatial_shape) * math.sqrt(2) / 2.0
    return dist <= r


def reference_gibbs_layer_mask(spatial_shape: Sequence[int], alpha) -> jnp.ndarray:
    """The reference ``GibbsNoiseLayer`` mask (``stylization_layers.py:91-116``).

    Binary: 1 where ``dist <= alpha * dist.max()``, else 0, with the true
    center ``(n-1)/2``. Note the reference's ``where`` pair makes this a hard
    mask whose gradient w.r.t. alpha is zero almost everywhere — which is why
    the reference trains alpha by finite differences. Kept for faithfulness;
    use :func:`soft_gibbs_mask` for a genuinely differentiable layer.
    """
    spatial_shape = tuple(int(n) for n in spatial_shape)
    center = [(n - 1) / 2 for n in spatial_shape]
    dist = jnp.sqrt(_dist_sq_grid(spatial_shape, center))
    norm_dist = dist / (jnp.asarray(alpha, jnp.float32) * jnp.max(dist))
    return jnp.where(norm_dist <= 1.0, 1.0, 0.0)


def soft_gibbs_mask(spatial_shape: Sequence[int], alpha, tau: float = 1.0) -> jnp.ndarray:
    """Differentiable Gibbs mask: ``sigmoid((alpha * dist_max - dist) / tau)``.

    A smooth edge of width ``tau`` (in voxels) around the radius
    ``alpha * dist_max`` gives a nonzero ``d(mask)/d(alpha)`` concentrated at
    the cut-off sphere, so alpha trains with plain ``jax.grad`` — replacing
    the reference's finite-difference loop
    (``gibbs0p7_layer_domain_GD.py:252-269``). As ``tau -> 0`` this converges
    to :func:`reference_gibbs_layer_mask`.
    """
    spatial_shape = tuple(int(n) for n in spatial_shape)
    center = [(n - 1) / 2 for n in spatial_shape]
    dist = jnp.sqrt(_dist_sq_grid(spatial_shape, center))
    radius = jnp.asarray(alpha, jnp.float32) * jnp.max(dist)
    return jax.nn.sigmoid((radius - dist) / tau)


# ---------------------------------------------------------------------------
# Ellipsoid shell — RandPlaneWaves sampling geometry
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _ellipsoid_shell_np(spatial_shape: Tuple[int, ...], a: float, b: float, c: float) -> np.ndarray:
    """Thin ellipsoid shell: 0.95 < (x/a)^2+(y/b)^2+(z/c)^2 < 1.05.

    Matches ``ellipsoid.binary_mask_3d`` (``filters_and_operators.py:294-325``):
    floor(n/2) center, per-axis squared offsets divided by the semi-axis
    squared in float32 (torch default dtype).
    """
    center = [n // 2 for n in spatial_shape]
    grids = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    semi = (a, b, c)
    q = np.zeros(spatial_shape, np.float32)
    for g, cen, s in zip(grids, center, semi):
        q = q + ((g - cen) ** 2).astype(np.float32) / np.float32(float(s) ** 2)
    return (q > 0.95) & (q < 1.05)


def ellipsoid_shell_mask(spatial_shape: Sequence[int], a: float, b: float, c: float) -> np.ndarray:
    """Boolean shell mask for plane-wave spike location sampling (3D)."""
    return _ellipsoid_shell_np(tuple(int(n) for n in spatial_shape), float(a), float(b), float(c))


def sample_ellipsoid(spatial_shape: Sequence[int], a: float, b: float, c: float,
                     rng: np.random.RandomState) -> Tuple[int, int, int]:
    """Uniformly sample one voxel index on the ellipsoid shell (host path).

    Reproduces ``ellipsoid.sample_ellipsoid`` (``filters_and_operators.py:342-352``):
    row-major nonzero enumeration + one ``randint`` draw from ``rng``.
    """
    shell = ellipsoid_shell_mask(spatial_shape, a, b, c)
    coords = np.argwhere(shell)  # row-major, same order as torch.nonzero
    idx = rng.randint(0, len(coords))
    return tuple(int(v) for v in coords[idx])


def sample_ellipsoid_traced(key: jax.Array, spatial_shape: Sequence[int],
                            a: float, b: float, c: float) -> jnp.ndarray:
    """Uniformly sample a shell voxel under jit; returns int32 index vector.

    The shell geometry is static so the mask is a compile-time constant; the
    draw is a categorical over shell voxels (uniform on the shell).
    """
    shell = ellipsoid_shell_mask(spatial_shape, a, b, c)
    logits = jnp.where(jnp.asarray(shell.ravel()), 0.0, -jnp.inf)
    flat = jax.random.categorical(key, logits)
    return jnp.stack(jnp.unravel_index(flat, tuple(spatial_shape)))
