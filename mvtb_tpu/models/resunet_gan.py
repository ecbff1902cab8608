"""ReconGAN networks: residual autoencoder G + encoder D.

Architecture parity with ``50_reconstruction/reconGan/networks.py``:
``ResidualBlock`` (three Conv-InstanceNorm-PReLU stages nf -> nf/2 -> nf with
an additive skip), ``ResidualEncoder`` (stride-2 in), ``ResidualDecoder``
(stride-2 transposed out), ``ResUnetGenerator`` (4-down/4-up, *additive*
skips, Tanh head, optional global residual ``+ x`` — present in the reconGan
variant (its line 126), absent in the adversarial-gibbs clone), and
``ResUnetDiscriminator`` (encoder arm + 8x8 conv to a scalar logit).
Channel-last layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _in_prelu(x):
    x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                     use_bias=False, use_scale=False)(x)
    return nn.PReLU(negative_slope_init=0.25)(x)


class ResidualBlock(nn.Module):
    nf: int

    @nn.compact
    def __call__(self, x):
        y = _in_prelu(nn.Conv(self.nf, (3, 3), (1, 1), padding="SAME")(x))
        y = _in_prelu(nn.Conv(self.nf // 2, (3, 3), (1, 1), padding="SAME")(y))
        y = _in_prelu(nn.Conv(self.nf, (3, 3), (1, 1), padding="SAME")(y))
        return y + x


class ResidualEncoder(nn.Module):
    out_chans: int

    @nn.compact
    def __call__(self, x):
        x = _in_prelu(nn.Conv(self.out_chans, (3, 3), (2, 2), padding="SAME")(x))
        x = ResidualBlock(self.out_chans)(x)
        return _in_prelu(nn.Conv(self.out_chans, (3, 3), (1, 1), padding="SAME")(x))


class ResidualDecoder(nn.Module):
    out_chans: int

    @nn.compact
    def __call__(self, x):
        x = _in_prelu(nn.ConvTranspose(self.out_chans, (3, 3), (1, 1),
                                       padding="SAME")(x))
        x = ResidualBlock(self.out_chans)(x)
        return _in_prelu(nn.ConvTranspose(self.out_chans, (3, 3), (2, 2),
                                          padding="SAME")(x))


class ResUnetGenerator(nn.Module):
    """Residual autoencoder G; input (B, 128, 128, in_chans) in [-1, 1]-ish."""

    in_chans: int = 2
    nf: int = 16
    global_residual: bool = True  # reconGan: out = final(de0) + x

    @nn.compact
    def __call__(self, x):
        en1 = ResidualEncoder(self.nf * 1)(x)    # 64
        en2 = ResidualEncoder(self.nf * 2)(en1)  # 32
        en3 = ResidualEncoder(self.nf * 4)(en2)  # 16
        en4 = ResidualEncoder(self.nf * 8)(en3)  # 8

        de3 = ResidualDecoder(self.nf * 4)(en4)
        de2 = ResidualDecoder(self.nf * 2)(de3 + en3)
        de1 = ResidualDecoder(self.nf * 1)(de2 + en2)
        de0 = ResidualDecoder(self.nf * 1)(de1 + en1)

        out = jnp.tanh(nn.Conv(self.in_chans, (3, 3), (1, 1), padding="SAME")(de0))
        return out + x if self.global_residual else out


class ResUnetDiscriminator(nn.Module):
    """Encoder arm + fully-connected 8x8 conv -> (B, 1, 1, 1) logit."""

    nf: int = 16

    @nn.compact
    def __call__(self, x):
        x = ResidualEncoder(self.nf * 1)(x)
        x = ResidualEncoder(self.nf * 2)(x)
        x = ResidualEncoder(self.nf * 4)(x)
        x = ResidualEncoder(self.nf * 8)(x)
        return nn.Conv(1, (8, 8), (1, 1), padding="VALID")(x)
