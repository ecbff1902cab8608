"""Import-path shim: ``stylization_layers`` module name for reference scripts.

Torch-composable facades of the reference's ``source_code/
stylization_layers.py`` classes. Each is a real ``torch.nn.Module`` whose
forward runs the jitted JAX compute, so the learnable-layer script family
(``10_scripts/300_instutional_distribution/350_stylized_layers/*.py``) runs
verbatim: the scripts define their own

    class Gibbs_UNet(nn.Module):
        def __init__(self, alpha):
            self.gibbs = GibbsNoiseLayer(alpha)
            self.ResUnet = UNet(...)          # the monai-shim facade UNet

(``gibbs0p7_layer_domain_GD.py:192-212``), call ``model.to(device)`` /
``Adam(model.parameters())``, and mutate ``model.gibbs.alpha`` inside the
``@torch.no_grad()`` finite-difference routine
(``gibbs0p7_layer_domain_GD.py:251-269``: ``old_alpha = alpha.clone()``,
``model.gibbs.alpha = old_alpha + h``). ``alpha`` here is a plain
requires-grad torch tensor — NOT an ``nn.Parameter`` — exactly like the
reference (``stylization_layers.py:72-77``), so ``model.parameters()``
yields only the UNet leaves and Adam never touches alpha; alpha moves by
the scripts' FD updates.

The TPU-native (Flax, ``jax.grad``-trainable) versions live in
:mod:`mvtb_tpu.models.layers` and are re-exported with ``Flax`` prefixes.
"""

from __future__ import annotations

import numpy as np
import torch

from mvtb_tpu.compat.filters_and_operators import Fourier  # noqa: F401
from mvtb_tpu.models.layers import (  # noqa: F401
    GibbsNoiseLayer as FlaxGibbsNoiseLayer,
    GibbsUNet as FlaxGibbsUNet,
    SpikeLayer as FlaxSpikeLayer,
    SpikesUNet as FlaxSpikesUNet,
)

_jitted_gibbs = None


def _gibbs_forward(x: np.ndarray, alpha: float) -> np.ndarray:
    """Jitted hard-mask Gibbs over ``x.shape[1:]`` dims — the reference
    layer transforms everything past dim 0 (``stylization_layers.py:81``:
    ``n_dims = len(img.shape[1:])``, mask over ``k.shape[1:]`` with the
    true center ``(n-1)/2``). ``alpha`` is a traced argument so the FD
    routine's per-step alpha changes reuse one compilation."""
    global _jitted_gibbs
    if _jitted_gibbs is None:
        import jax

        def apply(v, a):
            from mvtb_tpu.ops import fft_shifted, ifft_shifted_real
            from mvtb_tpu.ops.masks import reference_gibbs_layer_mask

            n_dims = v.ndim - 1
            mask = reference_gibbs_layer_mask(v.shape[1:], a)
            k = fft_shifted(v, n_dims)
            return ifft_shifted_real(k * mask.astype(k.real.dtype), n_dims)

        _jitted_gibbs = jax.jit(apply)
    return np.asarray(_jitted_gibbs(x, np.float32(alpha)))


class GibbsNoiseLayer(torch.nn.Module):
    """Gibbs layer facade (``stylization_layers.py:55-116``).

    ``alpha`` is a plain requires-grad tensor attribute supporting the
    scripts' read/assign pattern; the forward reads its current value and
    runs the jitted hard-mask filter (the reference's ``where``-pair mask,
    whose gradient w.r.t. alpha is zero a.e. — hence the scripts' FD
    updates, which work here unchanged)."""

    def __init__(self, alpha=None) -> None:
        super().__init__()
        self.device = torch.device("cpu")
        if alpha is None:
            self.alpha = torch.rand(1, requires_grad=True)
        else:
            alpha = min(max(float(alpha), 0.0), 1.0)
            self.alpha = torch.tensor([alpha], requires_grad=True)

    def forward(self, img):
        from mvtb_tpu.compat.monai._tensor import ArrayTensor

        a = float(self.alpha.detach().reshape(-1)[0])
        x = np.asarray(img, np.float32)
        return _gibbs_forward(x, a).view(ArrayTensor)


class spike_layer(torch.nn.Module):
    """Spike layer facade (``stylization_layers.py:143-151``): a fresh
    ``RandKSpaceSpikeNoise(prob=1, intensity_range=(i, i),
    channel_wise=False)`` per forward, with ``intensity`` a tensor attribute
    the spikes GD scripts mutate (``spikes11_layer_domain_GD.py:262-277``)."""

    def __init__(self, intensity) -> None:
        super().__init__()
        self.intensity = torch.as_tensor(float(intensity))

    def forward(self, x):
        from mvtb_tpu.compat.filters_and_operators import RandKSpaceSpikeNoise
        from mvtb_tpu.compat.monai._tensor import ArrayTensor

        i = self.intensity.item()
        t = RandKSpaceSpikeNoise(prob=1.0, intensity_range=(i, i),
                                 channel_wise=False)
        return np.asarray(t(np.asarray(x, np.float32))).view(ArrayTensor)


class Gibbs_UNet(torch.nn.Module):
    """Gibbs layer -> 3D ResUNet(1->1) (``stylization_layers.py:119-139``).

    The reference's ``__init__`` ignores its ``alpha`` argument and
    hard-codes 0.5 (its line 125) — scripts re-define their own class to
    work around it; here ``alpha`` is honored (documented divergence)."""

    def __init__(self, alpha=None) -> None:
        super().__init__()
        from mvtb_tpu.compat.monai.networks.nets import UNet

        self.gibbs = GibbsNoiseLayer(alpha)
        self.ResUnet = UNet(dimensions=3, in_channels=1, out_channels=1,
                            channels=(16, 32, 64, 128, 256),
                            strides=(2, 2, 2, 2), num_res_units=2)

    def forward(self, img):
        img = self.gibbs(img)
        img = self.ResUnet(img)
        return img


class Spikes_UNet(torch.nn.Module):
    """Spike layer -> 3D ResUNet(1->1) (``stylization_layers.py:154-173``)."""

    def __init__(self, intensity=15) -> None:
        super().__init__()
        from mvtb_tpu.compat.monai.networks.nets import UNet

        self.spike = spike_layer(intensity)
        self.ResUnet = UNet(dimensions=3, in_channels=1, out_channels=1,
                            channels=(16, 32, 64, 128, 256),
                            strides=(2, 2, 2, 2), num_res_units=2)

    def forward(self, img):
        img = self.spike(img)
        img = self.ResUnet(img)
        return img
