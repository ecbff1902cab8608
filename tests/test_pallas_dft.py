"""Pallas matmul-DFT kernels (ops/pallas_dft.py) vs the numpy FFT contract.

Interpret mode is exact (no PRNG), so full numeric parity runs on CPU.
Shapes are chosen to hit the tail-masking paths: M and B dims that do not
divide the block sizes, lane counts that are not multiples of 128, and both
odd and even half-spectrum axes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.ops import pallas_dft

on_tpu = jax.default_backend() == "tpu"
INTERP = not on_tpu
PREC = jax.lax.Precision.HIGHEST


@pytest.fixture
def vol():
    return np.random.RandomState(0).randn(3, 12, 10, 14).astype(np.float32)


def test_rdft_nd_matches_numpy(vol):
    got = np.asarray(pallas_dft.rdft_nd(jnp.asarray(vol), axes=(1, 2, 3),
                                        precision=PREC, interpret=INTERP))
    want = np.fft.rfftn(vol, axes=(1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_last", [14, 15])  # even + odd half axes
def test_rdft_irdft_roundtrip(n_last):
    x = np.random.RandomState(1).randn(2, 10, 12, n_last).astype(np.float32)
    k = pallas_dft.rdft_nd(jnp.asarray(x), axes=(1, 2, 3),
                           precision=PREC, interpret=INTERP)
    back = np.asarray(pallas_dft.irdft_nd_real(
        k, s=x.shape[1:], axes=(1, 2, 3), precision=PREC, interpret=INTERP))
    np.testing.assert_allclose(back, x, rtol=2e-4, atol=2e-4)


def test_dft_nd_complex_matches_numpy(vol):
    z = (vol + 1j * vol[::-1]).astype(np.complex64)
    got = np.asarray(pallas_dft.dft_nd(jnp.asarray(z), axes=(1, 2, 3),
                                       precision=PREC, interpret=INTERP))
    want = np.fft.fftn(z, axes=(1, 2, 3))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-6)


def test_idft_nd_matches_numpy(vol):
    z = (vol + 1j * vol[::-1]).astype(np.complex64)
    got = np.asarray(pallas_dft.idft_nd(jnp.asarray(z), axes=(1, 2, 3),
                                        precision=PREC, interpret=INTERP))
    want = np.fft.ifftn(z, axes=(1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_idft_nd_real_matches_real_part(vol):
    k = np.fft.fftn(vol, axes=(1, 2, 3)).astype(np.complex64)
    got = np.asarray(pallas_dft.idft_nd_real(jnp.asarray(k), axes=(1, 2, 3),
                                             precision=PREC, interpret=INTERP))
    np.testing.assert_allclose(got, vol, rtol=2e-4, atol=2e-4)


def test_single_interior_axis_matches_numpy(vol):
    """Sublane-contract orientation alone (axis neither first-looped nor
    last): transform over axis 1 only."""
    got = np.asarray(pallas_dft.dft_nd(jnp.asarray(vol), axes=(1,),
                                       precision=PREC, interpret=INTERP))
    want = np.fft.fft(vol, axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_last_axis_only_matches_numpy(vol):
    """Lane-contract orientation alone: transform over the last axis."""
    got = np.asarray(pallas_dft.dft_nd(jnp.asarray(vol), axes=(3,),
                                       precision=PREC, interpret=INTERP))
    want = np.fft.fft(vol, axis=3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rdft_requires_half_axis_last(vol):
    with pytest.raises(ValueError):
        pallas_dft.rdft_nd(jnp.asarray(vol), axes=(3, 2, 1),
                           interpret=INTERP)


def test_matches_dft_module_bitwise_choices(vol):
    """Same matrices and contraction order as ops/dft.py — outputs agree to
    f32 roundoff (both are 3-dot Gauss chains over identical operands)."""
    from mvtb_tpu.ops import dft

    got = np.asarray(pallas_dft.rdft_nd(jnp.asarray(vol), axes=(1, 2, 3),
                                        precision=PREC, interpret=INTERP))
    want = np.asarray(dft.rdft_nd(jnp.asarray(vol), axes=(1, 2, 3),
                                  precision=PREC))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
