"""Independent torch/numpy oracle implementing the *documented semantics* of
the reference's corruption transforms (see SURVEY.md section 2 and the per-op
citations in mvtb_tpu/ops/corruptions.py). Used to verify parity of the JAX
ops on CPU golden tensors. Written from the behavioral spec, not the
reference source.
"""

from math import floor

import numpy as np
import torch


def shift_fourier(x: torch.Tensor, n_dims: int) -> torch.Tensor:
    dims = tuple(range(-n_dims, 0))
    return torch.fft.fftshift(torch.fft.fftn(x, dim=dims), dim=dims)


def inv_shift_fourier_real(k: torch.Tensor, n_dims: int) -> torch.Tensor:
    dims = tuple(range(-n_dims, 0))
    return torch.fft.ifftn(torch.fft.ifftshift(k, dim=dims), dim=dims).real


def disk_mask(spatial_shape, r, inside_off=False) -> np.ndarray:
    """floor(n/2)-centered integer-grid disk: keep dist^2 < r^2 (or complement)."""
    center = [floor(n / 2) for n in spatial_shape]
    grids = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    inside = sum((g - c) ** 2 for g, c in zip(grids, center)) < r ** 2
    return (~inside if inside_off else inside).astype(np.float32)


def fourier_disk_filter(x: torch.Tensor, r, n_dims=3, inside_off=False) -> torch.Tensor:
    k = shift_fourier(x, n_dims)
    mask = torch.from_numpy(disk_mask(x.shape[-n_dims:], r, inside_off))
    return inv_shift_fourier_real(k * mask, n_dims)


def gibbs_mask(spatial_shape, alpha) -> np.ndarray:
    """(n-1)/2-centered float64 mask: keep dist <= (1-alpha)*max(shape)*sqrt(2)/2."""
    r = (1 - alpha) * np.max(spatial_shape) * np.sqrt(2) / 2.0
    center = (np.array(spatial_shape) - 1) / 2
    coords = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    dist = np.sqrt(sum((g - c) ** 2 for g, c in zip(coords, center)))
    return dist <= r


def gibbs_noise(x: torch.Tensor, alpha) -> torch.Tensor:
    n_dims = x.dim() - 1
    k = shift_fourier(x, n_dims)
    mask = torch.from_numpy(gibbs_mask(x.shape[1:], alpha).astype(np.float32))
    return inv_shift_fourier_real(k * mask, n_dims)


def kspace_spike(x: torch.Tensor, locs, intensities) -> torch.Tensor:
    """log(|k|+1e-10)/phase split, point writes, exp recombine."""
    n_dims = x.dim() - 1
    k = shift_fourier(x, n_dims)
    log_abs = torch.log(torch.abs(k) + 1e-10)
    phase = torch.angle(k)
    for loc, val in zip(locs, intensities):
        if len(loc) == x.dim():
            log_abs[tuple(loc)] = float(val)
        else:
            log_abs[(slice(None),) + tuple(loc)] = torch.as_tensor(val, dtype=log_abs.dtype)
    k_new = torch.exp(log_abs) * torch.exp(1j * phase)
    return inv_shift_fourier_real(k_new, n_dims)


def plane_wave(x: torch.Tensor, loc, intensity, n_dims=3) -> torch.Tensor:
    k = shift_fourier(x, n_dims)
    log_abs = k.abs().log()
    phase = k.angle()
    log_abs[(slice(None),) + tuple(loc)] = float(intensity)
    k_new = log_abs.exp() * torch.exp(1j * phase)
    return inv_shift_fourier_real(k_new, n_dims)


def wrap_artifact(x: torch.Tensor, alpha) -> torch.Tensor:
    """Sequential odd-k-line scaling along each of 3 spatial axes of (C,H,W,D)."""
    k = shift_fourier(x, 3)
    k[:, 1::2, :, :] = k[:, 1::2, :, :] * alpha
    k[:, :, 1::2, :] = k[:, :, 1::2, :] * alpha
    k[:, :, :, 1::2] = k[:, :, :, 1::2] * alpha
    return inv_shift_fourier_real(k, 3)


def salt_and_pepper(x: torch.Tensor, p, u: torch.Tensor) -> torch.Tensor:
    x = x.clone()
    hi, lo = x.max() / 2, x.min() / 2
    x[u <= p / 2] = lo
    x[(u > p / 2) & (u <= p)] = hi
    return x


def rand_zero_fill(x: torch.Tensor, p, u: torch.Tensor) -> torch.Tensor:
    n_dims = x.dim() - 1
    k = shift_fourier(x, n_dims)
    k = k.clone()
    k[u <= p] = 0
    return inv_shift_fourier_real(k, n_dims)


def ellipsoid_shell(spatial_shape, a, b, c) -> np.ndarray:
    """0.95 < q < 1.05 shell, floor(n/2) center, float32 per-axis division."""
    center = [floor(n / 2) for n in spatial_shape]
    grids = np.ogrid[tuple(slice(0, n) for n in spatial_shape)]
    q = np.zeros(spatial_shape, np.float32)
    for g, cen, s in zip(grids, center, (a, b, c)):
        q = q + ((g - cen) ** 2).astype(np.float32) / np.float32(s ** 2)
    return (q > 0.95) & (q < 1.05)
