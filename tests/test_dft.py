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


@pytest.mark.parametrize("shape", [(6, 8, 10), (5, 7, 9), (4, 6, 7)])
def test_rdft_matches_rfftn(shape):
    x = np.random.RandomState(4).randn(2, *shape).astype(np.float32)
    axes = (-3, -2, -1)
    want = np.asarray(jnp.fft.rfftn(jnp.asarray(x), axes=axes))
    got = np.asarray(dft.rdft_nd(jnp.asarray(x), axes))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


@pytest.mark.parametrize("shape", [(6, 8, 10), (5, 7, 9)])
def test_irdft_matches_irfftn(shape):
    x = np.random.RandomState(5).randn(2, *shape).astype(np.float32)
    axes = (-3, -2, -1)
    k = jnp.fft.rfftn(jnp.asarray(x), axes=axes)
    # perturb so the half spectrum is a generic Hermitian-representable input
    k = k * (1.0 + 0.1j)
    want = np.asarray(jnp.fft.irfftn(k, s=shape, axes=axes))
    got = np.asarray(dft.irdft_nd_real(k, shape, axes))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


def test_auto_backend_resolution():
    """"auto" resolves to the XLA FFT on CPU (bit-parity, no O(n) MAC tax)
    and honors the MXU size bound; explicit names pass through; unknown
    names raise."""
    from mvtb_tpu.ops.fused import _resolve_backend

    import jax

    assert jax.default_backend() == "cpu"  # the test env pins cpu
    assert _resolve_backend("auto", (240, 240, 155)) == "xla"
    for name in ("xla", "dft", "dft_fast", "hybrid"):
        assert _resolve_backend(name, (240, 240, 155)) == name
    with pytest.raises(ValueError):
        _resolve_backend("fftw", (16, 16))


@pytest.mark.parametrize("shape", [
    (12, 14, 10),   # mixed: 14 = 2*7 is matmul-backed, 12/10 are XLA-backed
    (8, 6, 10),     # all 2/3/5-smooth: degenerates to native rfftn/irfftn
    (7, 11, 13),    # no smooth axis: degenerates to the all-matmul path
    (14, 9, 22),    # non-smooth leading and trailing axes
])
def test_hybrid_rdft_matches_rfftn(shape):
    x = np.random.RandomState(8).randn(2, *shape).astype(np.float32)
    axes = (-3, -2, -1)
    want = np.asarray(jnp.fft.rfftn(jnp.asarray(x), axes=axes))
    got = np.asarray(dft.hybrid_rdft_nd(jnp.asarray(x), axes))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)

    k = jnp.asarray(want) * (1.0 + 0.1j)
    want_inv = np.asarray(jnp.fft.irfftn(k, s=shape, axes=axes))
    got_inv = np.asarray(dft.hybrid_irdft_nd_real(k, shape, axes))
    scale = max(np.abs(want_inv).max(), 1e-6)
    np.testing.assert_allclose(got_inv, want_inv, atol=2e-5 * scale, rtol=1e-4)


@pytest.mark.parametrize("shape", [(12, 14, 10), (7, 11, 13), (8, 6, 10)])
def test_hybrid_complex_path_matches_fftn(shape):
    x = np.random.RandomState(9).randn(2, *shape).astype(np.float32)
    axes = (-3, -2, -1)
    want = np.asarray(jnp.fft.fftn(jnp.asarray(x), axes=axes))
    got = np.asarray(dft.hybrid_dft_nd(jnp.asarray(x), axes))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)

    k = jnp.asarray(want) * (1.0 + 0.05j)
    want_inv = np.asarray(jnp.fft.ifftn(k, axes=axes).real)
    got_inv = np.asarray(dft.hybrid_idft_nd_real(k, axes))
    scale = max(np.abs(want_inv).max(), 1e-6)
    np.testing.assert_allclose(got_inv, want_inv, atol=2e-5 * scale, rtol=1e-4)


def test_fused_backend_dispatch():
    """StylizeConfig(fft_backend=...) reproduces the XLA-path output —
    f32-accurate for "dft", ~1e-3 relative for single-pass bf16 "dft_fast"
    (both the rfft-eligible and the complex (zero-fill) program)."""
    import jax

    from mvtb_tpu.ops.fused import StylizeConfig, stylize_kspace

    x = jnp.asarray(np.random.RandomState(6).randn(3, 16, 18, 15)
                    .astype(np.float32))
    key = jax.random.key(7)
    half = dict(disk_r=(4.0, 8.0), wrap_alpha=0.5, spike=True,
                spike_range=(6.0, 7.0), plane_axes=(5.0, 5.0, 4.0),
                plane_intensity=6.0, sap_p=0.05)
    full = dict(disk_r=6.0, zf_p=0.1, spike=True, spike_range=(6.0, 7.0))
    for base in (half, full):
        ref = stylize_kspace(x, key, StylizeConfig(**base))
        scale = float(jnp.abs(ref).max())
        acc = stylize_kspace(x, key, StylizeConfig(**base, fft_backend="dft"))
        assert float(jnp.abs(ref - acc).max()) < 1e-5 * scale
        hyb = stylize_kspace(x, key,
                             StylizeConfig(**base, fft_backend="hybrid"))
        assert float(jnp.abs(ref - hyb).max()) < 1e-5 * scale
        fast = stylize_kspace(x, key,
                              StylizeConfig(**base, fft_backend="dft_fast"))
        assert float(jnp.abs(ref - fast).max()) < 2e-2 * scale
