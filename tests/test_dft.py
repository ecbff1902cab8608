"""Matmul-DFT backend: numerical parity with jnp.fft on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.ops import dft


@pytest.mark.parametrize("shape,axes", [
    ((2, 24, 20, 15), (-3, -2, -1)),
    ((3, 32, 17), (-2, -1)),
    ((1, 31), (-1,)),
])
def test_forward_matches_fftn(shape, axes):
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    want = np.asarray(jnp.fft.fftn(jnp.asarray(x), axes=axes))
    got = np.asarray(dft.dft_nd(jnp.asarray(x), axes))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


def test_inverse_matches_ifftn():
    x = np.random.RandomState(1).randn(2, 16, 13).astype(np.float32)
    k = jnp.fft.fftn(jnp.asarray(x), axes=(-2, -1))
    want = np.asarray(jnp.fft.ifftn(k, axes=(-2, -1)))
    got = np.asarray(dft.idft_nd(k, (-2, -1)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_roundtrip_real():
    x = np.random.RandomState(2).randn(2, 24, 20, 15).astype(np.float32)
    out = np.asarray(dft.idft_nd_real(dft.dft_nd(jnp.asarray(x), (-3, -2, -1)),
                                      (-3, -2, -1)))
    np.testing.assert_allclose(out, x, atol=3e-6, rtol=1e-5)


def test_complex_input_forward():
    rng = np.random.RandomState(3)
    x = (rng.randn(2, 12, 10) + 1j * rng.randn(2, 12, 10)).astype(np.complex64)
    want = np.asarray(jnp.fft.fftn(jnp.asarray(x), axes=(-2, -1)))
    got = np.asarray(dft.dft_nd(jnp.asarray(x), (-2, -1)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


def test_use_matmul_dft_bound():
    assert dft.use_matmul_dft((240, 240, 155))
    assert not dft.use_matmul_dft((8192, 64))
