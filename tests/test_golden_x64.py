"""Bit-level golden parity under float64 (BASELINE.md: 'bit-level FFT-mask
parity on CPU golden tensors').

Masks are already bit-exact (test_ops_parity). Here the whole
FFT -> mask -> iFFT pipeline runs in float64 under ``enable_x64`` and is
compared against an independently computed numpy-double reference to double
precision — the CPU golden-tensor contract.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mvtb_tpu import ops

SHAPE = (2, 12, 10, 9)


def _numpy_gibbs(x64: np.ndarray, alpha: float) -> np.ndarray:
    """Independent float64 reference: centered FFT, GibbsNoise mask, inverse."""
    axes = (-3, -2, -1)
    k = np.fft.fftshift(np.fft.fftn(x64, axes=axes), axes=axes)
    shape = x64.shape[1:]
    r = (1 - alpha) * np.max(shape) * np.sqrt(2) / 2.0
    center = (np.array(shape) - 1) / 2
    grids = np.ogrid[tuple(slice(0, n) for n in shape)]
    dist = np.sqrt(sum((g - c) ** 2 for g, c in zip(grids, center)))
    k = k * (dist <= r)
    return np.fft.ifftn(np.fft.ifftshift(k, axes=axes), axes=axes).real


def _numpy_disk(x64: np.ndarray, rr: float, inside_off: bool) -> np.ndarray:
    axes = (-3, -2, -1)
    k = np.fft.fftshift(np.fft.fftn(x64, axes=axes), axes=axes)
    shape = x64.shape[1:]
    center = [n // 2 for n in shape]
    grids = np.ogrid[tuple(slice(0, n) for n in shape)]
    inside = sum((g - c) ** 2 for g, c in zip(grids, center)) < rr ** 2
    mask = ~inside if inside_off else inside
    k = k * mask
    return np.fft.ifftn(np.fft.ifftshift(k, axes=axes), axes=axes).real


@pytest.mark.parametrize("alpha", [0.0, 0.33, 0.8])
def test_gibbs_golden_double_precision(alpha):
    x = np.random.RandomState(0).randn(*SHAPE)
    with jax.enable_x64(True):
        got = np.asarray(ops.gibbs_noise(jnp.asarray(x, jnp.float64), alpha))
    want = _numpy_gibbs(x, alpha)
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-12)


@pytest.mark.parametrize("rr,inside_off", [(3.0, False), (4.5, True)])
def test_disk_golden_double_precision(rr, inside_off):
    x = np.random.RandomState(1).randn(*SHAPE)
    with jax.enable_x64(True):
        got = np.asarray(ops.fourier_disk_filter(jnp.asarray(x, jnp.float64),
                                                 rr, 3, inside_off))
    want = _numpy_disk(x, rr, inside_off)
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-12)


def test_wrap_golden_double_precision():
    x = np.random.RandomState(2).randn(*SHAPE)
    axes = (-3, -2, -1)
    k = np.fft.fftshift(np.fft.fftn(x, axes=axes), axes=axes)
    k[:, 1::2, :, :] *= 0.5
    k[:, :, 1::2, :] *= 0.5
    k[:, :, :, 1::2] *= 0.5
    want = np.fft.ifftn(np.fft.ifftshift(k, axes=axes), axes=axes).real
    with jax.enable_x64(True):
        got = np.asarray(ops.wrap_artifact(jnp.asarray(x, jnp.float64), 0.5))
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-12)
