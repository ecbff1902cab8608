"""Golden parity of the functional k-space ops against the torch/numpy oracle.

Masks must match bit-for-bit; FFT round-trip outputs match the CPU oracle to
float32 tolerance (same math, different FFT library accumulations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mvtb_tpu import ops
import reference_oracle as ref

SHAPE_3D = (2, 24, 20, 15)  # (C,H,W,D), odd depth exercises shift conventions
SHAPE_2D = (3, 32, 17)


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def assert_close(jx, tx, atol=2e-4, rtol=2e-4):
    a = np.asarray(jx)
    b = tx.numpy() if isinstance(tx, torch.Tensor) else np.asarray(tx)
    scale = max(1.0, float(np.abs(b).max()))
    np.testing.assert_allclose(a, b, atol=atol * scale, rtol=rtol)


# ---------------------------------------------------------------- masks ----

@pytest.mark.parametrize("r", [2.0, 5.5, 9.0, 100.0])
@pytest.mark.parametrize("inside_off", [False, True])
def test_disk_mask_bit_parity(r, inside_off):
    got = np.asarray(ops.disk_mask(SHAPE_3D[1:], r, inside_off))
    want = ref.disk_mask(SHAPE_3D[1:], r, inside_off)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.1, 0.37, 0.5, 0.99, 1.0])
def test_gibbs_mask_bit_parity(alpha):
    got = np.asarray(ops.gibbs_mask((24, 20, 15), alpha))
    want = ref.gibbs_mask((24, 20, 15), alpha)
    np.testing.assert_array_equal(got, want)


def test_gibbs_mask_2d_bit_parity():
    got = np.asarray(ops.gibbs_mask((240, 240), 0.42))
    want = ref.gibbs_mask((240, 240), 0.42)
    np.testing.assert_array_equal(got, want)


def test_ellipsoid_shell_bit_parity():
    got = ops.ellipsoid_shell_mask((24, 20, 15), 10, 8, 5)
    want = ref.ellipsoid_shell((24, 20, 15), 10, 8, 5)
    np.testing.assert_array_equal(got, want)


def test_traced_disk_mask_matches_concrete():
    r = 6.5
    concrete = np.asarray(ops.disk_mask((24, 20, 15), r))
    traced = np.asarray(jax.jit(lambda rr: ops.disk_mask((24, 20, 15), rr))(jnp.float32(r)))
    np.testing.assert_array_equal(concrete, traced)


# ----------------------------------------------------------- transforms ----

def test_fourier_roundtrip_identity():
    x = _rand(SHAPE_3D)
    out = ops.ifft_shifted_real(ops.fft_shifted(jnp.asarray(x), 3), 3)
    assert_close(out, x, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("r,inside_off", [(5.0, False), (5.0, True), (9.5, False)])
def test_fourier_disk_filter_parity(r, inside_off):
    x = _rand(SHAPE_3D)
    got = ops.fourier_disk_filter(jnp.asarray(x), r, 3, inside_off)
    want = ref.fourier_disk_filter(torch.from_numpy(x), r, 3, inside_off)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.7, 1.0])
def test_gibbs_noise_parity(alpha):
    x = _rand(SHAPE_3D)
    got = ops.gibbs_noise(jnp.asarray(x), alpha)
    want = ref.gibbs_noise(torch.from_numpy(x), alpha)
    assert_close(got, want)


def test_gibbs_noise_alpha0_identity():
    x = _rand(SHAPE_3D)
    out = ops.gibbs_noise(jnp.asarray(x), 0.0)
    assert_close(out, x, atol=1e-5, rtol=1e-5)


def test_gibbs_noise_2d():
    x = _rand(SHAPE_2D)
    got = ops.gibbs_noise(jnp.asarray(x), 0.4)
    want = ref.gibbs_noise(torch.from_numpy(x), 0.4)
    assert_close(got, want)


def test_kspace_spike_parity_channel_specific():
    x = _rand(SHAPE_3D)
    locs = [(0, 3, 4, 5), (1, 10, 2, 7)]
    vals = [12.0, 13.5]
    got = ops.kspace_spike(jnp.asarray(x), locs, vals)
    want = ref.kspace_spike(torch.from_numpy(x), locs, vals)
    assert_close(got, want)


def test_kspace_spike_parity_broadcast():
    x = _rand(SHAPE_3D)
    locs = [(10, 2, 7)]
    vals = [np.array([13.0, 14.0], np.float32)]  # per-channel values
    got = ops.kspace_spike(jnp.asarray(x), locs, vals)
    want = ref.kspace_spike(torch.from_numpy(x), locs, vals)
    assert_close(got, want)


def test_default_spike_intensity_stats():
    x = _rand(SHAPE_3D)
    got = ops.default_spike_intensity_stats(jnp.asarray(x))
    k = ref.shift_fourier(torch.from_numpy(x), 3)
    want = torch.log(torch.abs(k) + 1e-10).mean(dim=(-3, -2, -1)) * 2.5
    assert_close(got, want, atol=1e-4)


def test_plane_wave_parity():
    x = _rand(SHAPE_3D)
    got = ops.plane_wave(jnp.asarray(x), (5, 6, 7), 14.0)
    want = ref.plane_wave(torch.from_numpy(x), (5, 6, 7), 14.0)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 1.0])
def test_wrap_artifact_parity(alpha):
    x = _rand(SHAPE_3D)
    got = ops.wrap_artifact(jnp.asarray(x), alpha)
    want = ref.wrap_artifact(torch.from_numpy(x), alpha)
    assert_close(got, want)


def test_wrap_alpha1_identity():
    x = _rand(SHAPE_3D)
    assert_close(ops.wrap_artifact(jnp.asarray(x), 1.0), x, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("p", [0.0, 0.1, 0.35])
def test_salt_and_pepper_parity(p):
    x = _rand(SHAPE_3D)
    u = np.random.RandomState(1).rand(*SHAPE_3D).astype(np.float32)
    got = ops.salt_and_pepper(jnp.asarray(x), p, u=jnp.asarray(u))
    want = ref.salt_and_pepper(torch.from_numpy(x), p, torch.from_numpy(u))
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_sap_p0_identity():
    x = _rand(SHAPE_3D)
    out = ops.salt_and_pepper(jnp.asarray(x), 0.0, key=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.parametrize("p", [0.0, 0.2, 0.9])
def test_rand_zero_fill_parity(p):
    x = _rand(SHAPE_3D)
    k_shape = SHAPE_3D
    u = np.random.RandomState(2).rand(*k_shape).astype(np.float32)
    got = ops.rand_zero_fill(jnp.asarray(x), p, u=jnp.asarray(u))
    want = ref.rand_zero_fill(torch.from_numpy(x), p, torch.from_numpy(u))
    assert_close(got, want)


# -------------------------------------------------------- vmap/jit/grad ----

def test_ops_jit_and_vmap():
    x = jnp.asarray(_rand((4,) + SHAPE_3D))  # (B,C,H,W,D)
    f = jax.jit(jax.vmap(lambda v: ops.gibbs_noise(v, 0.5)))
    out = f(x)
    assert out.shape == x.shape
    single = ops.gibbs_noise(x[0], 0.5)
    assert_close(out[0], np.asarray(single), atol=1e-5)


def test_soft_gibbs_mask_has_alpha_gradient():
    x = jnp.asarray(_rand((1, 16, 16, 8)))

    def loss(alpha):
        k = ops.fft_shifted(x, 3)
        m = ops.soft_gibbs_mask(x.shape[1:], alpha)
        out = ops.ifft_shifted_real(k * m.astype(jnp.complex64), 3)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.float32(0.5))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_reference_layer_mask_binary():
    m = ops.reference_gibbs_layer_mask((16, 16, 8), 0.5)
    vals = np.unique(np.asarray(m))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_kspace_spike_random_traced():
    x = jnp.asarray(_rand(SHAPE_3D))
    out = jax.jit(
        lambda v, k: ops.kspace_spike_random(v, k, (12.0, 13.0), channel_wise=True)
    )(x, jax.random.key(3))
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_sample_ellipsoid_host_matches_shell():
    rng = np.random.RandomState(0)
    shell = ops.ellipsoid_shell_mask((24, 20, 15), 10, 8, 5)
    for _ in range(10):
        c = ops.sample_ellipsoid((24, 20, 15), 10, 8, 5, rng)
        assert shell[c]


def test_sample_ellipsoid_traced_on_shell():
    shell = ops.ellipsoid_shell_mask((24, 20, 15), 10, 8, 5)
    idx = jax.jit(lambda k: ops.sample_ellipsoid_traced(k, (24, 20, 15), 10, 8, 5))(
        jax.random.key(7)
    )
    assert shell[tuple(np.asarray(idx))]
