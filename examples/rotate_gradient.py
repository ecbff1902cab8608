"""Gradient-through-a-geometric-parameter toy, JAX edition.

The reference's ``350_stylized_layers/rotate.py`` probes whether a gradient
flows through a 2x2 matrix applied to a vector — the proof-of-concept that
led to the soft (differentiable) Gibbs mask of ``GibbsNoiseLayer``. Here the
same question is answered the JAX way: parameterize a rotation by its
*angle*, build the matrix inside the function, and differentiate end-to-end
with ``jax.grad`` — the exact mechanism ``mvtb_tpu.models.layers.GibbsLayer``
uses to learn its mask radius (alpha) without finite differences.

Run: ``python examples/rotate_gradient.py``
"""

import jax
import jax.numpy as jnp


def rotate(theta: jax.Array, v: jax.Array) -> jax.Array:
    m = jnp.array([[jnp.cos(theta), -jnp.sin(theta)],
                   [jnp.sin(theta), jnp.cos(theta)]])
    return m @ v


def main() -> None:
    v = jnp.array([1.0, 0.0])
    target = jnp.array([0.0, 1.0])  # rotate x-hat onto y-hat => theta = pi/2

    def loss(theta):
        return jnp.sum((rotate(theta, v) - target) ** 2)

    theta = jnp.asarray(0.3)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    for it in range(30):
        val, g = grad_fn(theta)
        theta = theta - 0.1 * g
        if it % 5 == 0:
            print(f"it {it:2d} loss {float(val):.6f} theta {float(theta):.4f}")
    print(f"final theta {float(theta):.4f} (target {jnp.pi / 2:.4f})")


if __name__ == "__main__":
    main()
