"""Pure-functional k-space corruption ops.

Every op is ``f(x, params[, key]) -> x_hat`` on channel-first arrays with the
trailing ``n_dims`` axes spatial, and is safe under ``jit``/``vmap``/``grad``.
"""

from mvtb_tpu.ops.fourier import fft_shifted, ifft_shifted, ifft_shifted_real
from mvtb_tpu.ops.masks import (
    disk_mask,
    gibbs_mask,
    soft_gibbs_mask,
    reference_gibbs_layer_mask,
    ellipsoid_shell_mask,
    sample_ellipsoid,
    sample_ellipsoid_traced,
)
from mvtb_tpu.ops.corruptions import (
    fourier_disk_filter,
    gibbs_noise,
    kspace_spike,
    kspace_spike_random,
    default_spike_intensity_stats,
    plane_wave,
    wrap_artifact,
    salt_and_pepper,
    rand_zero_fill,
)
from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch, stylize_kspace

__all__ = [
    "fft_shifted",
    "ifft_shifted",
    "ifft_shifted_real",
    "disk_mask",
    "gibbs_mask",
    "soft_gibbs_mask",
    "reference_gibbs_layer_mask",
    "ellipsoid_shell_mask",
    "sample_ellipsoid",
    "sample_ellipsoid_traced",
    "fourier_disk_filter",
    "gibbs_noise",
    "kspace_spike",
    "kspace_spike_random",
    "default_spike_intensity_stats",
    "plane_wave",
    "wrap_artifact",
    "salt_and_pepper",
    "rand_zero_fill",
    "stylize_kspace",
    "stylize_batch",
    "StylizeConfig",
]
