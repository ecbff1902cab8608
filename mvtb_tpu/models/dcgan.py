"""DCGAN generator/discriminator for 128x128 MRI slice synthesis.

Architecture parity with ``50_reconstruction/networks.py``: G is six
transposed convs 100 -> (ngf*16)x4x4 -> ... -> nc x 128 x 128 with
BatchNorm+ReLU and a final Tanh; D mirrors it with strided convs,
LeakyReLU(0.2), BatchNorm after all but the first conv, and raw logits out
(losses use BCE-with-logits). Layout is channel-last (TPU-preferred);
weights use the DCGAN N(0, 0.02) init (``networks.py:8-14``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.normal(stddev=0.02)
# torch BatchNorm scale init N(1, 0.02) per the reference's weights_init.
bn_scale_init = nn.initializers.normal(stddev=0.02)


def _bn(train: bool, name: str):
    def scale_init(key, shape, dtype=jnp.float32):
        return 1.0 + bn_scale_init(key, shape, dtype)

    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, scale_init=scale_init, name=name)


class Generator(nn.Module):
    """z (B, 1, 1, nz) -> image (B, 128, 128, nc) in [-1, 1]."""

    nz: int = 100
    ngf: int = 128
    nc: int = 1

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.ConvTranspose(self.ngf * 16, (4, 4), (1, 1), padding="VALID",
                             use_bias=False, kernel_init=conv_init)(z)  # 4x4
        x = nn.relu(_bn(train, "bn0")(x))
        widths = [self.ngf * 8, self.ngf * 4, self.ngf * 2, self.ngf]
        for i, w in enumerate(widths):  # 8, 16, 32, 64
            x = nn.ConvTranspose(w, (4, 4), (2, 2), padding="SAME",
                                 use_bias=False, kernel_init=conv_init)(x)
            x = nn.relu(_bn(train, f"bn{i + 1}")(x))
        x = nn.ConvTranspose(self.nc, (4, 4), (2, 2), padding="SAME",
                             use_bias=False, kernel_init=conv_init)(x)  # 128
        return jnp.tanh(x)


class Discriminator(nn.Module):
    """image (B, 128, 128, nc) -> logits (B, 1, 1, 1)."""

    nc: int = 1
    ndf: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.ndf, (4, 4), (2, 2), padding="SAME", use_bias=False,
                    kernel_init=conv_init)(x)  # 64
        x = nn.leaky_relu(x, 0.2)
        widths = [self.ndf * 2, self.ndf * 4, self.ndf * 8, self.ndf * 16]
        for i, w in enumerate(widths):  # 32, 16, 8, 4
            x = nn.Conv(w, (4, 4), (2, 2), padding="SAME", use_bias=False,
                        kernel_init=conv_init)(x)
            x = nn.leaky_relu(_bn(train, f"bn{i}")(x), 0.2)
        x = nn.Conv(1, (4, 4), (1, 1), padding="VALID", use_bias=False,
                    kernel_init=conv_init)(x)  # 1x1 logits
        return x
