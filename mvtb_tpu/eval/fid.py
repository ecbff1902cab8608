"""FID-style evaluation for the GAN family.

The reference evaluates its GANs by eye (fixed-noise sample grids,
``dcgan.py:148-151``; ``reconGan_test.ipynb``). This adds a quantitative
metric: the Frechet distance between real and generated samples in a feature
space. With no pretrained Inception available in this environment, features
come from a **frozen fixed-seed conv encoder** (:class:`FrozenFeatureEncoder`
— random-projection features, a standard Inception-free FID variant whose
feature space never moves, so scores compare across runs and checkpoints).
The round-2 discriminator-feature variant (:func:`discriminator_features`)
is kept as an explicit opt-in only: its feature space co-trains with the
generator, which makes the number incomparable across runs (round-2 VERDICT
weak item 3). :func:`frechet_distance` itself is the exact classic formula
and accepts any feature extractor.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

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


class FrozenFeatureEncoder:
    """Training-invariant feature net: a fixed-seed random conv stack.

    Four stride-2 4x4 convs with LeakyReLU(0.2) and a global mean-pool to a
    ``features[-1]``-dim vector. Parameters are a pure function of ``seed``
    and are never trained — two instances with the same seed embed
    identically forever, which is exactly the property the co-trained
    discriminator features lacked. Random conv projections preserve
    distributional distances well enough for *relative* FID comparisons
    (the classic random-feature FID variant).
    """

    def __init__(self, nc: int = 1, seed: int = 0,
                 features: Tuple[int, ...] = (32, 64, 128, 256)):
        import flax.linen as nn
        import jax

        feats = tuple(features)

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                for f in feats:
                    x = nn.Conv(f, (4, 4), (2, 2), padding="SAME",
                                use_bias=False)(x)
                    x = jax.nn.leaky_relu(x, 0.2)
                return x.mean(axis=(1, 2))

        self.seed = seed
        self.nc = nc
        net = _Net()
        # conv params are spatial-size independent: init on a small probe
        self._params = jax.jit(net.init)(
            jax.random.key(seed), jnp.zeros((1, 32, 32, nc), jnp.float32))
        self._apply = jax.jit(net.apply)

    def __call__(self, x: Array) -> Array:
        x = jnp.asarray(x, jnp.float32)
        return self._apply(self._params, x)


def fid_score(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    """Frechet distance between two feature sets (each (N, D))."""
    mu_r, cov_r = feature_statistics(real_features)
    mu_f, cov_f = feature_statistics(fake_features)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def dcgan_fid(g_state, d_state=None, real_batches=(), key=None,
              nz: int = 100, n_fake: Optional[int] = None,
              encoder: Optional[Callable] = None,
              features: str = "frozen") -> float:
    """End-to-end FID for a trained DCGAN.

    Features come from a :class:`FrozenFeatureEncoder` by default (seed 0),
    so the score is comparable across runs and checkpoints. Pass
    ``features="discriminator"`` (with ``d_state``) for the legacy co-trained
    feature space — useful only for single-run diagnostics, never for
    comparisons. ``d_state`` stays in the positional signature for
    round-2 call-site compatibility.
    """
    import jax

    real_batches = list(real_batches)
    nc = int(np.asarray(real_batches[0]).shape[-1])
    if encoder is None:
        if features == "discriminator":
            if d_state is None:
                raise ValueError("features='discriminator' needs d_state")

            def encoder(x):
                return discriminator_features(
                    d_state.apply_fn,
                    {"params": d_state.params,
                     "batch_stats": d_state.batch_stats}, x)
        else:
            encoder = FrozenFeatureEncoder(nc=nc)

    real_feats = []
    n_real = 0
    for batch in real_batches:
        x = jnp.asarray(batch)
        real_feats.append(np.asarray(encoder(x)))
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
        fake_feats.append(np.asarray(encoder(fake)))
        made += bs
    return fid_score(np.concatenate(real_feats),
                     np.concatenate(fake_feats)[:n_fake])
