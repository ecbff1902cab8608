"""Flax model zoo: 3D ResUNet, stylization layers, DCGAN, ReconGAN nets."""

from mvtb_tpu.models.unet3d import ConvNormAct, ResidualUnit, UNet, apply_channel_first
from mvtb_tpu.models.layers import (
    GibbsNoiseLayer,
    GibbsUNet,
    Gibbs_UNet,
    SpikeLayer,
    SpikesUNet,
    Spikes_UNet,
    spike_layer,
)
from mvtb_tpu.models.dcgan import Discriminator, Generator
from mvtb_tpu.models.resunet_gan import (
    ResidualBlock,
    ResidualDecoder,
    ResidualEncoder,
    ResUnetDiscriminator,
    ResUnetGenerator,
)

__all__ = [
    "ConvNormAct", "ResidualUnit", "UNet", "apply_channel_first",
    "GibbsNoiseLayer", "GibbsUNet", "Gibbs_UNet", "SpikeLayer", "SpikesUNet",
    "Spikes_UNet", "spike_layer",
    "Discriminator", "Generator",
    "ResidualBlock", "ResidualDecoder", "ResidualEncoder",
    "ResUnetDiscriminator", "ResUnetGenerator",
]
