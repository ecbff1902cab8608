"""Learnable-stylization training: joint grads or faithful finite differences.

The reference trains ``Gibbs_UNet`` with Adam backprop on the UNet while
updating the Gibbs alpha by finite-difference descent
(``gibbs0p7_layer_domain_GD.py:252-298``: ``delta = (loss(a+h) - loss(a)) / h;
a -= lr * delta`` with h=0.01, lr=0.02) because its hard mask has zero
backprop gradient. Here:

* :func:`learnable_train_step` — the TPU-native way: alpha is a Flax param
  behind a sigmoid-soft mask, one ``jax.value_and_grad`` over *all* params,
  one optimizer. No extra forward passes.
* :func:`fd_train_step` — faithful mode: backprop updates everything except
  alpha; alpha moves by the reference's two-extra-forward-pass FD rule
  (works with ``hard=True`` masks too). Both jitted end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvtb_tpu.train.losses import dice_loss
from mvtb_tpu.train.seg import TrainState

Array = jnp.ndarray

# The stylization parameter lives under the layer module's name:
# GibbsUNet -> params["gibbs"]["alpha"]; SpikesUNet -> params["spike"]["intensity"].

def _styl_path(params):
    if "gibbs" in params:
        return ("gibbs", "alpha")
    if "spike" in params:
        return ("spike", "intensity")
    raise KeyError("no stylization layer (gibbs/spike) in params")


def _get_styl_param(params):
    node = params
    for k in _styl_path(params):
        node = node[k]
    return node


def _set_styl_param(params, value):
    path = _styl_path(params)

    def walk(node, p):
        if not p:
            return value
        return {**node, p[0]: walk(node[p[0]], p[1:])}

    return walk(params, path)


@partial(jax.jit, static_argnames=("train_alpha",), donate_argnums=(0,))
def learnable_train_step(state: TrainState, image: Array, label: Array,
                         rng: jax.Array, train_alpha: bool = True
                         ) -> Tuple[TrainState, Array, Array]:
    """Joint theta+alpha step via plain jax.grad (image/label channel-first).

    ``rng`` feeds the model's "corruption" stream (used by SpikeLayer; unused
    but harmless for GibbsUNet). Returns (state, loss, alpha) — alpha (or the
    spike intensity) is logged as the reference logs its trajectory
    (``gibbs_trajectory_*.txt``). ``train_alpha=False`` pins the stylization
    parameter (the reference's no-GD scripts, e.g.
    ``gibbs0p7_layer_domain.py``: alpha is a bare requires_grad tensor that
    never reaches the optimizer, so it stays at its initial value).
    """

    def loss_fn(params):
        logits = state.apply_fn({"params": params}, image,
                                rngs={"corruption": rng})
        return dice_loss(jnp.moveaxis(logits, 1, -1), jnp.moveaxis(label, 1, -1))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    if not train_alpha:
        grads = _set_styl_param(grads, jnp.zeros_like(_get_styl_param(grads)))
    state = state.apply_gradients(grads=grads)
    return state, loss, _get_styl_param(state.params)[0]


@partial(jax.jit, static_argnames=("h", "lr"), donate_argnums=(0,))
def fd_train_step(state: TrainState, image: Array, label: Array,
                  rng: jax.Array, h: float = 0.01, lr: float = 0.02
                  ) -> Tuple[TrainState, Array, Array]:
    """Reference-faithful step: backprop for the network, FD for alpha.

    Matches ``Gibbs_GD`` (``gibbs0p7_layer_domain_GD.py:252-269``): two extra
    no-grad forward passes evaluate loss(alpha) and loss(alpha+h); alpha
    moves against the secant slope. The backprop grad for alpha is discarded
    (the reference never registered alpha with its optimizer).
    """

    def loss_fn(params):
        logits = state.apply_fn({"params": params}, image,
                                rngs={"corruption": rng})
        return dice_loss(jnp.moveaxis(logits, 1, -1), jnp.moveaxis(label, 1, -1))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    grads = _set_styl_param(grads, jnp.zeros_like(_get_styl_param(grads)))
    state = state.apply_gradients(grads=grads)

    # finite-difference alpha update (two forward passes, no grads)
    alpha = _get_styl_param(state.params)
    l0 = loss_fn(state.params)
    lh = loss_fn(_set_styl_param(state.params, alpha + h))
    delta = (lh - l0) / h
    new_alpha = alpha - lr * delta
    state = state.replace(params=_set_styl_param(state.params, new_alpha))
    return state, loss, new_alpha[0]


def create_learnable_state(key: jax.Array, model, input_shape_cf,
                           tx: Optional[object] = None,
                           freeze_unet: bool = False,
                           unet_optimizer: str = "adam",
                           transfer_params=None,
                           lr: float = 1e-4,
                           weight_decay: float = 1e-5) -> TrainState:
    """Init a channel-first stylization model (GibbsUNet/SpikesUNet).

    ``freeze_unet`` zeroes network updates so only the stylization parameter
    trains; ``unet_optimizer="sgd"`` swaps the network optimizer (reference
    GD variants); ``transfer_params`` warm-starts the UNet from another
    model's params (the transfer-from-baseline variant,
    ``gibbs0p7_layer_domain_GD.py:218-233``).
    """
    import optax

    from mvtb_tpu.train.seg import reference_optimizer

    rngs = {"params": key, "corruption": jax.random.fold_in(key, 1)}
    variables = jax.jit(model.init)(rngs, jnp.zeros(input_shape_cf, jnp.float32))
    params = variables["params"]
    if transfer_params is not None:
        params = {**params, "unet": transfer_params["unet"]
                  if "unet" in transfer_params else transfer_params}

    if tx is None:
        base = (optax.sgd(lr) if unet_optimizer == "sgd"
                else reference_optimizer(lr, weight_decay))
        if freeze_unet:
            styl_key = _styl_path(params)[0]

            def label_fn(p):
                return {k: ("styl" if k == styl_key else "frozen") for k in p}

            tx = optax.multi_transform(
                {"styl": base, "frozen": optax.set_to_zero()}, label_fn)
        else:
            tx = base
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
