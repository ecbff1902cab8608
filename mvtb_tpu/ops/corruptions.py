"""Functional MRI k-space corruption ops.

Each op takes a channel-first array ``x`` whose trailing ``n_dims`` axes are
spatial, and returns the corrupted image (real dtype of the input's kind).
All ops are jit/vmap-safe; those with float parameters are grad-safe in the
parameter where a gradient exists.

Reference semantics (cited per op) come from
``/root/reference/source_code/filters_and_operators.py`` (FO) and
``/root/reference/50_reconstruction/reconGan/utils2.py`` (U2). The ops run the
whole FFT -> k-space edit -> iFFT path on device; the reference ran it on CPU
dataloader workers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.ops.fourier import fft_shifted, from_polar, ifft_shifted_real
from mvtb_tpu.ops.masks import disk_mask, gibbs_mask

Array = jnp.ndarray


def _default_n_dims(x: Array, n_dims: Optional[int]) -> int:
    """Spatial rank: everything after the leading channel axis (FO:664)."""
    return x.ndim - 1 if n_dims is None else n_dims


# ---------------------------------------------------------------------------
# Gibbs ringing
# ---------------------------------------------------------------------------

def fourier_disk_filter(x: Array, r, n_dims: int = 3, inside_off: bool = False) -> Array:
    """Disk-mask filter in k-space (core of ``RandFourierDiskMaskd``, FO:236-252).

    FFT over the trailing ``n_dims`` axes, multiply by a binary disk mask of
    radius ``r`` centered at ``floor(n/2)`` (low-pass when ``inside_off`` is
    False -> Gibbs ringing), inverse FFT, keep the real part.
    """
    k = fft_shifted(x, n_dims)
    mask = disk_mask(x.shape[-n_dims:], r, inside_off)
    return ifft_shifted_real(k * jnp.asarray(mask, k.real.dtype), n_dims)


def gibbs_noise(x: Array, alpha, n_dims: Optional[int] = None) -> Array:
    """Canonical Gibbs transform (``GibbsNoise``, FO:663-705).

    Keeps k-space within ``r = (1-alpha) * max(shape) * sqrt(2)/2`` of the
    true center ``(shape-1)/2``; ``alpha=0`` is the identity.
    """
    nd = _default_n_dims(x, n_dims)
    k = fft_shifted(x, nd)
    mask = gibbs_mask(x.shape[-nd:], alpha)
    return ifft_shifted_real(k * jnp.asarray(mask, k.real.dtype), nd)


# ---------------------------------------------------------------------------
# k-space spikes (Herringbone artifact)
# ---------------------------------------------------------------------------

def default_spike_intensity_stats(x: Array, n_dims: Optional[int] = None) -> Array:
    """Per-channel mean log-magnitude of k-space, times 2.5.

    The reference's data-dependent default spike intensity
    (FO:932-933, FO:1118-1131). Returns shape ``x.shape[:-n_dims]``.
    """
    nd = _default_n_dims(x, n_dims)
    k = fft_shifted(x, nd)
    log_abs = jnp.log(jnp.abs(k) + 1e-10)
    return jnp.mean(log_abs, axis=tuple(range(-nd, 0))) * 2.5


def kspace_spike(
    x: Array,
    locs: Sequence[Tuple[int, ...]],
    intensities: Sequence[Union[float, Array]],
    n_dims: Optional[int] = None,
) -> Array:
    """Write spikes into log-|k| at fixed locations (``KSpaceSpikeNoise``, FO:906-983).

    Splits k into log-magnitude (``log(|k| + 1e-10)``) and phase, writes each
    intensity at its location, recombines ``exp(log|k|) * exp(i*phase)``, and
    inverse-transforms. A location of length ``n_dims`` broadcasts over the
    channel axis (its intensity may then be a per-channel vector); a location
    of length ``x.ndim`` targets one channel.
    """
    nd = _default_n_dims(x, n_dims)
    k = fft_shifted(x, nd)
    log_abs = jnp.log(jnp.abs(k) + 1e-10)
    phase = jnp.angle(k)

    n_lead = x.ndim - nd
    for loc, val in zip(locs, intensities):
        loc = tuple(int(i) for i in loc)
        val = jnp.asarray(val, log_abs.dtype)
        if len(loc) == x.ndim:
            log_abs = log_abs.at[loc].set(val)
        elif len(loc) == nd:
            idx = (slice(None),) * n_lead + loc
            log_abs = log_abs.at[idx].set(val)
        else:
            raise ValueError(
                f"Spike location {loc} must have length {nd} (all channels) "
                f"or {x.ndim} (single channel)."
            )
    k_new = from_polar(jnp.exp(log_abs), phase)
    return ifft_shifted_real(k_new, nd)


def kspace_spike_random(
    x: Array,
    key: jax.Array,
    intensity_range: Tuple[float, float],
    channel_wise: bool = True,
    n_dims: Optional[int] = None,
) -> Array:
    """Fully-traced random spike op for on-device augmentation.

    Samples one spike per channel (``channel_wise=True``) or one shared
    spatial location (``channel_wise=False``), each with a log-intensity drawn
    uniformly from ``intensity_range`` — the on-device analogue of
    ``RandKSpaceSpikeNoise._randomize`` (FO:1087-1103). ``x`` must be
    channel-first with exactly ``1 + n_dims`` axes.
    """
    nd = _default_n_dims(x, n_dims)
    if x.ndim != nd + 1:
        raise ValueError("kspace_spike_random expects (C, *spatial) input.")
    C = x.shape[0]
    spatial = x.shape[1:]

    k = fft_shifted(x, nd)
    log_abs = jnp.log(jnp.abs(k) + 1e-10)
    phase = jnp.angle(k)

    k_loc, k_int = jax.random.split(key)
    lo, hi = intensity_range
    if channel_wise:
        loc_keys = jax.random.split(k_loc, nd)
        locs = [jax.random.randint(loc_keys[d], (C,), 0, spatial[d]) for d in range(nd)]
        vals = jax.random.uniform(k_int, (C,), log_abs.dtype, lo, hi)
        log_abs = log_abs.at[(jnp.arange(C),) + tuple(locs)].set(vals)
    else:
        loc_keys = jax.random.split(k_loc, nd)
        locs = tuple(jax.random.randint(loc_keys[d], (), 0, spatial[d]) for d in range(nd))
        val = jax.random.uniform(k_int, (), log_abs.dtype, lo, hi)
        log_abs = log_abs.at[(slice(None),) + locs].set(val)

    k_new = from_polar(jnp.exp(log_abs), phase)
    return ifft_shifted_real(k_new, nd)


# ---------------------------------------------------------------------------
# Plane waves
# ---------------------------------------------------------------------------

def plane_wave(x: Array, loc, intensity, n_dims: int = 3) -> Array:
    """Single k-space point set to a fixed log-magnitude across all channels.

    Core of ``RandPlaneWaves_ellipsoid.__call__`` (FO:370-393): note the
    log has *no* epsilon here, matching the reference's ``k.abs().log()``.
    ``loc`` is a length-``n_dims`` index (static tuple or traced int vector).
    """
    k = fft_shifted(x, n_dims)
    k_abs_log = jnp.log(jnp.abs(k))
    k_angle = jnp.angle(k)

    n_lead = x.ndim - n_dims
    if isinstance(loc, (tuple, list)):
        idx = (slice(None),) * n_lead + tuple(int(i) for i in loc)
        k_abs_log = k_abs_log.at[idx].set(intensity)
    else:
        loc = jnp.asarray(loc)
        idx = (slice(None),) * n_lead + tuple(loc[d] for d in range(n_dims))
        k_abs_log = k_abs_log.at[idx].set(intensity)

    k_new = from_polar(jnp.exp(k_abs_log), k_angle)
    return ifft_shifted_real(k_new, n_dims)


# ---------------------------------------------------------------------------
# Wraparound / aliasing
# ---------------------------------------------------------------------------

def wrap_artifact(x: Array, alpha, n_dims: Optional[int] = None) -> Array:
    """Scale every odd-indexed k-line by ``alpha`` along each spatial axis.

    ``WrapArtifact.__call__`` (FO:503-515) does this with three sequential
    strided writes on a (C,H,W,D) tensor; multiplicative scaling composes, so
    it equals one elementwise multiply by the outer product of per-axis
    weight vectors ``w[i] = alpha if i odd else 1`` — a single fused
    VPU pass on TPU. Generalized to any ``n_dims`` (the reference hard-codes
    3D indexing despite documenting 2D support).
    """
    nd = _default_n_dims(x, n_dims)
    k = fft_shifted(x, nd)
    alpha = jnp.asarray(alpha, k.real.dtype)
    for d in range(-nd, 0):
        n = x.shape[d]
        odd = jnp.arange(n) % 2 == 1
        w = jnp.where(odd, alpha, jnp.ones((), k.real.dtype))
        shape = [1] * x.ndim
        shape[d] = n
        k = k * w.reshape(shape)
    return ifft_shifted_real(k, nd)


# ---------------------------------------------------------------------------
# Image-domain impulse noise
# ---------------------------------------------------------------------------

def salt_and_pepper(x: Array, p, key: Optional[jax.Array] = None, *,
                    u: Optional[Array] = None) -> Array:
    """Salt-and-pepper impulse noise (``SaltAndPepper.salt_and_pepper``, FO:465-482).

    Per-voxel uniform draw ``u``; ``u <= p/2`` -> pepper (``min(x)/2``),
    ``p/2 < u <= p`` -> salt (``max(x)/2``), else unchanged. Extrema are
    global over the whole tensor (all channels), as in the reference. Pass
    ``u`` explicitly to replay a host-sampled mask, otherwise provide ``key``.
    """
    if u is None:
        if key is None:
            raise ValueError("salt_and_pepper needs `key` or a precomputed `u`.")
        u = jax.random.uniform(key, x.shape, x.dtype)
    p = jnp.asarray(p, x.dtype)
    lo = x.min() / 2
    hi = x.max() / 2
    out = jnp.where(u <= p / 2, lo, x)
    out = jnp.where((u > p / 2) & (u <= p), hi, out)
    return out


# ---------------------------------------------------------------------------
# Random zero-fill (compressed-sensing undersampling)
# ---------------------------------------------------------------------------

def rand_zero_fill(x: Array, p, key: Optional[jax.Array] = None, *,
                   u: Optional[Array] = None, n_dims: Optional[int] = None) -> Array:
    """Randomly zero k-space points with probability ``p`` (``RandZF``, U2:34-74).

    Simulates compressed-sensing undersampling; the mask covers the full
    (channel-inclusive) k-space shape as in the reference.
    """
    nd = _default_n_dims(x, n_dims)
    k = fft_shifted(x, nd)
    if u is None:
        if key is None:
            raise ValueError("rand_zero_fill needs `key` or a precomputed `u`.")
        u = jax.random.uniform(key, k.shape, x.dtype)
    keep = u > jnp.asarray(p, x.dtype)
    return ifft_shifted_real(k * keep.astype(k.real.dtype), nd)
