"""Flax ResUNet matching the topology of MONAI's ``UNet`` as configured by the
reference (``10_scripts/20_Gibbs_filters/baseline.py:198-205``): dimensions=3,
channels=(16,32,64,128,256), strides=(2,2,2,2), num_res_units=2, PReLU
activations, InstanceNorm, concatenating skip connections; ~4.8M parameters
for in=4/out=3 (BASELINE.md compute anchor).

TPU-first design decisions (not a port):
* channel-last layout (``B, *spatial, C``) — XLA's preferred conv layout on
  TPU; :func:`apply_channel_first` adapts reference-layout data.
* all convs run through XLA's conv lowering onto the MXU; parameters can be
  held in float32 with bfloat16 compute via the ``dtype`` attribute.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

_DIMCHARS = "HWDXY"  # spatial dim labels for conv dimension_numbers


class Conv(nn.Module):
    """Channel-last convolution, parameter-compatible with ``nn.Conv``
    (same ``kernel``/``bias`` names, shapes, and init), with a measured
    TPU lowering: stride-1 kernel-3 3D convolutions run as three 2D
    convolutions over ``(B*D)`` slabs stitched by two shifted adds — an
    exact reformulation (SAME zero padding included) that profiled 1.3-2x
    faster per conv and 1.9x on the full fwd+bwd than XLA's native 3D conv
    path at the UNet's shapes (reports/train_step_profile/RESULTS.md).
    Everything else (strided, transposed-free generic cases) lowers through
    the standard ``conv_general_dilated``. ``slab=False`` forces the native
    path (the pure-XLA baseline, kept measured).
    """

    features: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    strides: Union[int, Tuple[int, ...]] = 1
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32
    slab: bool = True

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        k = tuple(self.kernel_size)
        s = self.strides if isinstance(self.strides, tuple) \
            else (self.strides,) * nd
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            k + (cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xd = x.astype(self.dtype)
        wd = kernel.astype(self.dtype)
        if (self.slab and nd == 3 and k == (3, 3, 3)
                and s == (1, 1, 1) and self.padding == "SAME"):
            B, H, W, D, C = xd.shape
            xs = jnp.moveaxis(xd, 3, 1).reshape(B * D, H, W, C)
            parts = []
            for dz in range(3):
                y = jax.lax.conv_general_dilated(
                    xs, wd[:, :, dz], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                parts.append(y.reshape(B, D, H, W, self.features))
            # depth tap dz contributes in[d + dz - 1] to out[d]; SAME zero
            # padding is reproduced by the zero-filled shifts
            out = parts[1]
            zero = jnp.zeros_like(parts[0][:, :1])
            out = out + jnp.concatenate([parts[2][:, 1:], zero], axis=1)
            out = out + jnp.concatenate([zero, parts[0][:, :-1]], axis=1)
            y = jnp.moveaxis(out, 1, 3)
        else:
            spatial = _DIMCHARS[:nd]
            y = jax.lax.conv_general_dilated(
                xd, wd, s, self.padding,
                dimension_numbers=(f"N{spatial}C", f"{spatial}IO",
                                   f"N{spatial}C"))
        return y + bias.astype(y.dtype)


class ConvNormAct(nn.Module):
    """Conv (optionally transposed) -> InstanceNorm -> PReLU.

    Mirrors MONAI's ``Convolution`` block in NDA ordering; ``conv_only``
    drops norm+act (used for final output layers).
    """

    features: int
    strides: int = 1
    kernel_size: int = 3
    transposed: bool = False
    conv_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2  # spatial rank
        k = (self.kernel_size,) * nd
        s = (self.strides,) * nd
        if self.transposed:
            # ConvTranspose stays on the native lowering: the pixel-shuffle
            # replacement LOST 1.6x end-to-end (RESULTS.md "experiments")
            x = nn.ConvTranspose(self.features, k, s, padding="SAME",
                                 dtype=self.dtype)(x)
        else:
            x = Conv(self.features, k, s, padding="SAME", dtype=self.dtype)(x)
        if not self.conv_only:
            # InstanceNorm (affine=False): per-channel, per-sample spatial norm.
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             use_bias=False, use_scale=False, dtype=self.dtype)(x)
            x = nn.PReLU(negative_slope_init=0.25)(x)
        return x


class ResidualUnit(nn.Module):
    """MONAI ``ResidualUnit``: ``subunits`` ConvNormAct blocks (first carries
    the stride) plus a projection residual when shape/channels change."""

    features: int
    strides: int = 1
    subunits: int = 2
    last_conv_only: bool = False
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        y = x
        for i in range(self.subunits):
            conv_only = self.last_conv_only and i == self.subunits - 1
            y = ConvNormAct(
                self.features,
                strides=self.strides if i == 0 else 1,
                kernel_size=self.kernel_size,
                conv_only=conv_only,
                dtype=self.dtype,
            )(y)
        if self.strides != 1 or in_features != self.features:
            nd = x.ndim - 2
            rk = (self.kernel_size,) * nd if self.strides != 1 else (1,) * nd
            res = Conv(self.features, rk, (self.strides,) * nd,
                       padding="SAME", dtype=self.dtype)(x)
        else:
            res = x
        return y + res


class UNet(nn.Module):
    """Recursive encoder/decoder with concatenating skips (MONAI ``UNet``).

    Args:
        out_channels: number of output channels (logits, no final activation).
        channels: encoder widths; the last entry is the bottom layer.
        strides: per-level downsampling factors (len == len(channels) - 1).
        num_res_units: residual subunits per conv block.
    """

    out_channels: int
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return self._block(x, self.out_channels, tuple(self.channels),
                           tuple(self.strides), is_top=True)

    def _down(self, x, features: int, strides: int):
        if self.num_res_units > 0:
            return ResidualUnit(features, strides, subunits=self.num_res_units,
                                dtype=self.dtype)(x)
        return ConvNormAct(features, strides, dtype=self.dtype)(x)

    def _up(self, x, features: int, strides: int, is_top: bool):
        conv_only = is_top and self.num_res_units == 0
        x = ConvNormAct(features, strides, transposed=True,
                        conv_only=conv_only, dtype=self.dtype)(x)
        if self.num_res_units > 0:
            x = ResidualUnit(features, 1, subunits=1, last_conv_only=is_top,
                             dtype=self.dtype)(x)
        return x

    def _block(self, x, out_features: int, channels: Tuple[int, ...],
               strides: Tuple[int, ...], is_top: bool):
        c, s = channels[0], strides[0]
        down = self._down(x, c, s)
        if len(channels) > 2:
            sub = self._block(down, c, channels[1:], strides[1:], is_top=False)
        else:
            sub = self._down(down, channels[1], 1)  # bottom layer
        cat = jnp.concatenate([down, sub], axis=-1)
        return self._up(cat, out_features, s, is_top)


def apply_channel_first(model: nn.Module, variables, x, **kwargs):
    """Apply a channel-last model to reference-layout ``(B, C, *spatial)`` data."""
    x = jnp.moveaxis(x, 1, -1)
    y = model.apply(variables, x, **kwargs)
    return jnp.moveaxis(y, -1, 1)
