"""FID-style evaluation for the GAN family.

The reference evaluates its GANs by eye (fixed-noise sample grids,
``dcgan.py:148-151``; ``reconGan_test.ipynb``). This adds a quantitative
metric: the Frechet distance between real and generated samples in a feature
space. With no pretrained Inception available in this environment, features
come from the trained discriminator's penultimate convolution (a standard
Inception-free FID variant); :func:`frechet_distance` itself is the exact
classic formula and accepts any feature extractor.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp

Array = jnp.ndarray


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray) -> float:
    """||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}) (Frechet/W2 between
    Gaussians). The cross-term uses the eigenvalues of C1 @ C2 (equal to
    tr of the matrix square root; clipped at 0 for numerical negatives)."""
    diff = float(np.sum((mu1 - mu2) ** 2))
    eigs = np.linalg.eigvals(cov1 @ cov2)
    tr_sqrt = float(np.sum(np.sqrt(np.clip(np.real(eigs), 0.0, None))))
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * tr_sqrt


def feature_statistics(features: np.ndarray):
    """(mean, covariance) of an (N, D) feature matrix."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def discriminator_features(apply_fn: Callable, variables, x: Array) -> Array:
    """Penultimate-conv features of the DCGAN discriminator, pooled to (B, D).

    Uses flax intermediate capture, so it works on the trained ``d_state``
    without modifying the model definition.
    """
    _, state = apply_fn(variables, x, train=False,
                        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]
    convs = sorted((k for k in inter if k.startswith("Conv")),
                   key=lambda k: int(k.split("_")[1]))
    feat = inter[convs[-2]]["__call__"][0]  # pre-logit conv output
    return feat.mean(axis=(1, 2))


def fid_score(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    """Frechet distance between two feature sets (each (N, D))."""
    mu_r, cov_r = feature_statistics(real_features)
    mu_f, cov_f = feature_statistics(fake_features)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def dcgan_fid(g_state, d_state, real_batches, key,
              nz: int = 100, n_fake: Optional[int] = None) -> float:
    """End-to-end FID for a trained DCGAN: D-feature statistics of the real
    batches vs the same number of generated samples."""
    import jax

    real_feats = []
    n_real = 0
    for batch in real_batches:
        x = jnp.asarray(batch)
        real_feats.append(np.asarray(discriminator_features(
            d_state.apply_fn,
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            x)))
        n_real += x.shape[0]
    n_fake = n_real if n_fake is None else n_fake

    fake_feats = []
    made = 0
    bs = real_feats[0].shape[0]
    while made < n_fake:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (bs, 1, 1, nz))
        fake = g_state.apply_fn(
            {"params": g_state.params, "batch_stats": g_state.batch_stats},
            z, train=False)
        fake_feats.append(np.asarray(discriminator_features(
            d_state.apply_fn,
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            fake)))
        made += bs
    return fid_score(np.concatenate(real_feats),
                     np.concatenate(fake_feats)[:n_fake])
