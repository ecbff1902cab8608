"""Jitted GAN training steps: DCGAN synthesis + ReconGAN reconstruction.

Loss/optimizer parity with the reference loops:

* DCGAN (``50_reconstruction/dcgan.py:83-153``): D maximizes
  ``log D(x) + log(1 - D(G(z)))`` via two BCE-with-logits terms (the
  reference's two backward passes sum to the same gradient); G maximizes
  ``log D(G(z))``. Adam(2e-4, beta1=0.5).
* ReconGAN image-domain (``reconGan/reconGan.py:120-141``): G loss =
  adv + 1*MSE(downsampled, fake) + 10*MSE(G(zf(real)), real); the
  undersampled input comes from the on-device ``rand_zero_fill`` (p=0.2).
* ReconGAN frequency-domain (``reconGan_freq.py:120-150``): G loss =
  adv + alpha*MSE(real, fake) + gamma*(MSE(Re k) + MSE(Im k)) with plain
  (unshifted) FFTs inside the loss — trivially differentiable under JAX.

``lax.stop_gradient`` replaces ``.detach()``. BatchNorm batch_stats thread
through each step as flax mutable collections.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from mvtb_tpu.ops.corruptions import rand_zero_fill
from mvtb_tpu.train.losses import bce_with_logits, mse

Array = jnp.ndarray


class GANState(train_state.TrainState):
    batch_stats: Any = None


def gan_optimizer(lr: float = 2e-4, beta1: float = 0.5) -> optax.GradientTransformation:
    return optax.adam(lr, b1=beta1, b2=0.999)


def create_gan_state(key: jax.Array, model, input_shape, lr: float = 2e-4,
                     beta1: float = 0.5, train_kwarg: bool = True) -> GANState:
    kwargs = {"train": False} if train_kwarg else {}
    variables = jax.jit(partial(model.init, **kwargs))(
        key, jnp.zeros(input_shape, jnp.float32))
    return GANState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=gan_optimizer(lr, beta1),
    )


def _apply(state: GANState, params, x, train: bool, has_bn: bool = True):
    """Forward with mutable batch stats when training."""
    if not has_bn:
        return state.apply_fn({"params": params}, x), None
    variables = {"params": params, "batch_stats": state.batch_stats}
    if train:
        out, mut = state.apply_fn(variables, x, train=True,
                                  mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return state.apply_fn(variables, x, train=False), None


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("real_label",))
def dcgan_step(g_state: GANState, d_state: GANState, real: Array,
               z: Array, real_label: float = 1.0
               ) -> Tuple[GANState, GANState, Dict[str, Array]]:
    """One DCGAN iteration (D then G), all on device.

    real: (B, H, W, C) in [-1, 1]; z: (B, 1, 1, nz) ~ N(0, 1).

    ``real_label < 1`` enables one-sided label smoothing (Salimans et al.
    2016) on D's real targets only — the measured mitigation for the
    D-dominance collapse on trivially-separable synthetic slices
    (round-4 ``reports/dcgan_full`` finding; round-4 VERDICT item 6). The
    reference default is 1.0 (``dcgan.py:28`` real_label).
    """

    # ---- D update: bce(D(real), 1) + bce(D(stop_grad(G(z))), 0) ----
    fake, g_bn = _apply(g_state, g_state.params, z, train=True)
    fake_sg = jax.lax.stop_gradient(fake)

    def d_loss_fn(d_params):
        out_real, bn1 = _apply(d_state, d_params, real, train=True)
        state1 = d_state.replace(batch_stats=bn1)
        out_fake, bn2 = _apply(state1, d_params, fake_sg, train=True)
        loss = bce_with_logits(out_real,
                               jnp.full_like(out_real, real_label)) + \
            bce_with_logits(out_fake, jnp.zeros_like(out_fake))
        return loss, (bn2, out_real, out_fake)

    (d_loss, (d_bn, out_real, out_fake1)), d_grads = \
        jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
    d_state = d_state.apply_gradients(grads=d_grads).replace(batch_stats=d_bn)

    # ---- G update: bce(D(G(z)), 1) against the *updated* D ----
    def g_loss_fn(g_params):
        fake2, g_bn2 = _apply(g_state, g_params, z, train=True)
        out, _ = _apply(d_state, d_state.params, fake2, train=True)
        return bce_with_logits(out, jnp.ones_like(out)), (g_bn2, out)

    (g_loss, (g_bn2, out_fake2)), g_grads = \
        jax.value_and_grad(g_loss_fn, has_aux=True)(g_state.params)
    g_state = g_state.apply_gradients(grads=g_grads).replace(batch_stats=g_bn2)

    metrics = {
        "d_loss": d_loss, "g_loss": g_loss,
        "D_x": jax.nn.sigmoid(out_real).mean(),
        "D_G_z1": jax.nn.sigmoid(out_fake1).mean(),
        "D_G_z2": jax.nn.sigmoid(out_fake2).mean(),
    }
    return g_state, d_state, metrics


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("zf_p", "alpha", "gamma", "freq_domain",
                          "compress_kind", "pre_corrupt_real", "real_label"))
def recon_gan_step(g_state: GANState, d_state: GANState, real: Array,
                   key: jax.Array, zf_p: float = 0.2,
                   alpha: float = 1.0, gamma: float = 10.0,
                   freq_domain: bool = False,
                   compress_kind: str = "zf",
                   pre_corrupt_real: bool = False,
                   real_label: float = 1.0
                   ) -> Tuple[GANState, GANState, Dict[str, Array]]:
    """One ReconGAN iteration (InstanceNorm nets — no batch stats).

    real: (B, H, W, C) slices. ``freq_domain=False`` -> image-domain cyclic
    loss (alpha=1, gamma=10); ``True`` -> frequency-consistency loss
    (reference runs alpha=15, gamma=0.1).

    ``compress_kind``: "zf" -> random k-space zero-fill (ReconGAN);
    "gibbs" -> RandGibbsNoise(1.0) with per-sample alpha ~ U[0,1] — the
    adversarial-gibbs GAN (``351_adversarial_gibbs/gibbs_gan.py:50,94-106``),
    which also pre-corrupts the "real" batch (``pre_corrupt_real=True``).
    """
    k0, k1, k2 = jax.random.split(key, 3)

    # on-device corruption (channel-first ops expect C leading)
    def compress(batch, k):
        cf = jnp.moveaxis(batch, -1, 1)
        keys = jax.random.split(k, cf.shape[0])
        if compress_kind == "zf":
            out = jax.vmap(lambda v, kk: rand_zero_fill(v, zf_p, kk))(cf, keys)
        elif compress_kind == "gibbs":
            from mvtb_tpu.ops.fused import StylizeConfig, stylize_kspace

            gcfg = StylizeConfig(n_dims=cf.ndim - 2, gibbs_alpha=(0.0, 1.0))
            out = jax.vmap(lambda v, kk: stylize_kspace(v, kk, gcfg))(cf, keys)
        else:
            raise ValueError(compress_kind)
        return jnp.moveaxis(out, 1, -1)

    if pre_corrupt_real:
        real = compress(real, k0)
    downsampled = compress(real, k1)

    def g_fwd(params, x):
        return g_state.apply_fn({"params": params}, x)

    def d_fwd(params, x):
        return d_state.apply_fn({"params": params}, x)

    fake = g_fwd(g_state.params, downsampled)
    fake_sg = jax.lax.stop_gradient(fake)

    def d_loss_fn(d_params):
        out_real = d_fwd(d_params, real)
        out_fake = d_fwd(d_params, fake_sg)
        # real_label < 1: one-sided label smoothing (see dcgan_step)
        return bce_with_logits(out_real,
                               jnp.full_like(out_real, real_label)) + \
            bce_with_logits(out_fake, jnp.zeros_like(out_fake))

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
    d_state = d_state.apply_gradients(grads=d_grads)

    def g_loss_fn(g_params):
        fake2 = g_fwd(g_params, downsampled)
        out = d_fwd(d_state.params, fake2)
        adv = bce_with_logits(out, jnp.ones_like(out))
        if freq_domain:
            img_consistency = mse(real, fake2)
            rk = jnp.fft.fftn(real, axes=(-3, -2))
            fk = jnp.fft.fftn(fake2, axes=(-3, -2))
            freq_consistency = mse(rk.real, fk.real) + mse(rk.imag, fk.imag)
            cyclic = alpha * img_consistency + gamma * freq_consistency
        else:
            fake_consistency = mse(downsampled, fake2)
            real_consistency = mse(g_fwd(g_params, compress(real, k2)), real)
            cyclic = alpha * fake_consistency + gamma * real_consistency
        return adv + cyclic, adv

    (g_loss, adv), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_state.params)
    g_state = g_state.apply_gradients(grads=g_grads)

    return g_state, d_state, {"d_loss": d_loss, "g_loss": g_loss, "adv": adv}
