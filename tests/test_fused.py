"""Fused stylization: the shift-free raw-coordinate implementation must match
the per-op (fftshift-based) reference path stage by stage."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu import ops
from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch, stylize_kspace

SHAPE = (2, 24, 20, 15)


def _x(seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*SHAPE).astype(np.float32))


def assert_close(a, b, tol=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a, b, atol=tol * scale, rtol=tol)


def test_disk_only_matches_op():
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(disk_r=6.0))
    want = ops.fourier_disk_filter(x, 6.0, 3, False)
    assert_close(got, want)


def test_disk_inside_off_matches_op():
    x = _x()
    cfg = StylizeConfig(disk_r=6.0, disk_inside_off=True)
    got = stylize_kspace(x, jax.random.key(0), cfg)
    want = ops.fourier_disk_filter(x, 6.0, 3, True)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.7])
def test_gibbs_only_matches_op(alpha):
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(gibbs_alpha=alpha))
    want = ops.gibbs_noise(x, alpha)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 1.0])
def test_wrap_only_matches_op(alpha):
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(wrap_alpha=alpha))
    want = ops.wrap_artifact(x, alpha)
    assert_close(got, want)


def test_wrap_even_and_odd_axes_2d():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 13).astype(np.float32))
    cfg = StylizeConfig(n_dims=2, wrap_alpha=0.25)
    got = stylize_kspace(x, jax.random.key(0), cfg)
    want = ops.wrap_artifact(x, 0.25, 2)
    assert_close(got, want)


def test_spike_shared_loc_matches_op():
    """Non-channel-wise spike: recover the sampled shifted loc and compare
    against the explicit kspace_spike op."""
    x = _x()
    cfg = StylizeConfig(spike=True, spike_range=(12.0, 12.0),
                        spike_channel_wise=False)
    got = stylize_kspace(x, jax.random.key(3), cfg)

    # replicate the key stream to find the sampled shifted location
    keys = jax.random.split(jax.random.key(3), 16)
    loc_keys = jax.random.split(keys[0], 3)
    loc = tuple(int(jax.random.randint(loc_keys[d], (), 0, SHAPE[1:][d]))
                for d in range(3))
    want = ops.kspace_spike(x, [loc], [12.0])
    assert_close(got, want)


def test_plane_wave_matches_op():
    x = _x()
    cfg = StylizeConfig(plane_axes=(6.0, 5.0, 4.0), plane_intensity=11.0)
    got = stylize_kspace(x, jax.random.key(5), cfg)

    keys = jax.random.split(jax.random.key(5), 16)
    shell = ops.ellipsoid_shell_mask(SHAPE[1:], 6.0, 5.0, 4.0)
    logits = jnp.where(jnp.asarray(shell.ravel()), 0.0, -jnp.inf)
    flat = jax.random.categorical(keys[0], logits)
    loc = tuple(int(v) for v in np.unravel_index(int(flat), SHAPE[1:]))
    want = ops.plane_wave(x, loc, 11.0)
    assert_close(got, want)


def test_prob_zero_stages_are_identity():
    x = _x()
    cfg = StylizeConfig(gibbs_alpha=0.8, gibbs_prob=0.0,
                        wrap_alpha=0.1, wrap_prob=0.0,
                        sap_p=0.9, sap_prob=0.0)
    out = stylize_kspace(x, jax.random.key(0), cfg)
    assert_close(out, x, tol=1e-5)


def test_empty_config_is_passthrough():
    x = _x()
    out = stylize_kspace(x, jax.random.key(0), StylizeConfig())
    assert out is x


def test_stacked_config_runs_and_differs_per_sample():
    xb = jnp.asarray(np.random.RandomState(2).randn(3, *SHAPE).astype(np.float32))
    cfg = StylizeConfig(disk_r=(5.0, 8.0), wrap_alpha=(0.3, 0.7),
                        spike=True, spike_range=(11.0, 12.0), sap_p=0.05)
    out = jax.jit(lambda v, k: stylize_batch(v, k, cfg))(xb, jax.random.key(0))
    assert out.shape == xb.shape
    assert np.isfinite(np.asarray(out)).all()
    # per-sample keys -> different corruption per batch element
    d01 = np.abs(np.asarray(out[0] - out[1])).max()
    assert d01 > 1e-3


def test_zero_fill_distribution():
    x = _x()
    out = stylize_kspace(x, jax.random.key(0), StylizeConfig(zf_p=1.0))
    # p=1 zeroes all of k-space
    assert float(jnp.abs(out).max()) < 1e-4


def test_grad_through_fused_gibbs():
    x = _x()

    def loss(scale):
        return jnp.sum(stylize_kspace(x * scale, jax.random.key(0),
                                      StylizeConfig(gibbs_alpha=0.5)) ** 2)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
