"""Scientific sanity: the differentiable Gibbs layer's alpha recovers a
target corruption level by plain gradient descent — the capability the
reference approximates with finite differences (its hard mask has zero
gradient a.e.)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvtb_tpu.ops import fft_shifted, ifft_shifted_real, soft_gibbs_mask


def test_alpha_recovers_target_radius():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 24, 24, 12).astype(np.float32))
    spatial = x.shape[1:]

    def gibbs_soft(v, alpha):
        k = fft_shifted(v, 3)
        m = soft_gibbs_mask(spatial, alpha, tau=0.5)
        return ifft_shifted_real(k * m.astype(k.dtype), 3)

    alpha_star = 0.35
    target = gibbs_soft(x, alpha_star)

    def loss_fn(alpha):
        return jnp.mean((gibbs_soft(x, alpha) - target) ** 2)

    alpha = jnp.float32(0.8)
    tx = optax.adam(0.05)
    opt = tx.init(alpha)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(120):
        loss, g = grad_fn(alpha)
        updates, opt = tx.update(g, opt)
        alpha = optax.apply_updates(alpha, updates)
    assert abs(float(alpha) - alpha_star) < 0.02, float(alpha)
    assert float(loss) < 1e-4


def test_reference_hard_mask_has_no_gradient():
    """The reference's mask construction (where-pair) really does give a zero
    alpha gradient — documenting why its scripts use finite differences."""
    from mvtb_tpu.ops import reference_gibbs_layer_mask

    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 8), np.float32)

    def loss_fn(alpha):
        k = fft_shifted(x, 3)
        m = reference_gibbs_layer_mask(x.shape[1:], alpha)
        return jnp.sum(ifft_shifted_real(k * m.astype(k.dtype), 3) ** 2)

    g = jax.grad(loss_fn)(jnp.float32(0.5))
    assert float(g) == 0.0
