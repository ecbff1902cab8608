"""Import-path shim: ``stylization_layers`` module name for reference scripts.

Maps the reference's nn.Module classes (``source_code/stylization_layers.py``)
to the Flax equivalents in :mod:`mvtb_tpu.models.layers`.
"""

from mvtb_tpu.compat.filters_and_operators import Fourier  # noqa: F401
from mvtb_tpu.models.layers import (  # noqa: F401
    GibbsNoiseLayer,
    GibbsUNet as Gibbs_UNet,
    SpikeLayer as spike_layer,
    SpikesUNet as Spikes_UNet,
)
