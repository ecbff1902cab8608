"""Pallas salt-and-pepper kernel.

The kernel's PRNG (``pltpu.prng_random_bits``) returns zeros in the Pallas
interpreter, so behavioral tests only run on a real TPU backend (the CPU
suite skips them; the verify drives exercise them on hardware). Structure
(shapes/padding) is still checked in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.ops.pallas_kernels import salt_and_pepper_pallas

on_tpu = jax.default_backend() == "tpu"
tpu_only = pytest.mark.skipif(not on_tpu, reason="Pallas PRNG needs real TPU")


@pytest.fixture
def x():
    return jnp.asarray(np.random.RandomState(0).randn(2, 24, 20, 15)
                       .astype(np.float32))


def test_sap_pallas_shape_roundtrip_interpret(x):
    # non-lane-aligned size exercises the pad/unpad path
    out = salt_and_pepper_pallas(x, 0.4, 7, interpret=not on_tpu)
    assert out.shape == x.shape and out.dtype == x.dtype


@tpu_only
def test_sap_pallas_fraction_and_levels(x):
    out = np.asarray(salt_and_pepper_pallas(x, 0.4, 7))
    xx = np.asarray(x)
    changed = (out != xx).mean()
    assert 0.3 < changed < 0.5
    lo, hi = xx.min() / 2, xx.max() / 2
    assert np.isclose(out, lo).any() and np.isclose(out, hi).any()
    keep = out == xx
    np.testing.assert_array_equal(out[keep], xx[keep])


@tpu_only
def test_sap_pallas_p0_identity(x):
    out = np.asarray(salt_and_pepper_pallas(x, 0.0, 3))
    np.testing.assert_array_equal(out, np.asarray(x))


@tpu_only
def test_sap_pallas_seed_determinism(x):
    a = np.asarray(salt_and_pepper_pallas(x, 0.2, 11))
    b = np.asarray(salt_and_pepper_pallas(x, 0.2, 11))
    c = np.asarray(salt_and_pepper_pallas(x, 0.2, 12))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_polar_roundtrip_interpret(x):
    """The fused polar kernel matches the reference chain (interpret mode is
    exact here — no PRNG involved)."""
    from mvtb_tpu.ops.pallas_kernels import polar_roundtrip_pallas

    k = jnp.fft.fftn(x, axes=(-3, -2, -1))
    re, im = jnp.real(k).astype(jnp.float32), jnp.imag(k).astype(jnp.float32)
    ore, oim = polar_roundtrip_pallas(re, im, interpret=not on_tpu)

    mag = np.exp(np.log(np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
                        + 1e-10))
    theta = np.arctan2(np.asarray(im), np.asarray(re))
    np.testing.assert_allclose(np.asarray(ore), mag * np.cos(theta),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(oim), mag * np.sin(theta),
                               rtol=1e-4, atol=1e-3)
