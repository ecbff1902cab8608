"""Centered FFT helpers over trailing spatial axes.

TPU-native equivalent of the reference's ``Fourier`` mixin
(``source_code/filters_and_operators.py:594-632``): a centered n-D FFT
(``fftshift(fftn(x))``) and its inverse (``ifftn(ifftshift(k))``), transforming
only the trailing ``n_dims`` axes so leading batch/channel axes pass through.
The inverse's ``.real`` drops imaginary leakage, matching the reference.

All functions are jit/vmap/grad-safe. Inputs of any float dtype are promoted
to complex64 by the FFT (complex128 under ``jax_enable_x64``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _spatial_axes(n_dims: int) -> tuple:
    return tuple(range(-n_dims, 0))


def fft_shifted(x: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Centered forward FFT over the trailing ``n_dims`` axes.

    Args:
        x: array whose trailing ``n_dims`` axes are spatial.
        n_dims: number of spatial dimensions (2 or 3 in practice).

    Returns:
        Complex k-space array with the zero frequency at ``floor(n/2)`` of
        each transformed axis.
    """
    axes = _spatial_axes(n_dims)
    return jnp.fft.fftshift(jnp.fft.fftn(x, axes=axes), axes=axes)


def ifft_shifted(k: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Inverse of :func:`fft_shifted`; returns the complex image."""
    axes = _spatial_axes(n_dims)
    return jnp.fft.ifftn(jnp.fft.ifftshift(k, axes=axes), axes=axes)


def ifft_shifted_real(k: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Inverse centered FFT keeping only the real part (drops leakage)."""
    return ifft_shifted(k, n_dims).real


def from_polar(magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """``magnitude * e^{i*phase}`` via cos/sin (complex ``exp`` is not lowered
    on all backends, and two real transcendentals fuse better on the VPU)."""
    import jax

    return jax.lax.complex(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase))
