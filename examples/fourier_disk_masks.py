"""Mask-design gallery — the reference's ``fourier_images_disk_masks.ipynb``
(44 cells of visual k-space mask exploration) as a reproducible script.

For one textured 2D slice, renders image + log-|k| panels for: the clean
slice, low-pass ``disk_mask`` filters at several radii (Gibbs ringing),
the high-pass complement (``inside_off=True``), ``GibbsNoise`` alphas
(the (n-1)/2-centered mask — a *different* mask from the disk, preserved
as in the reference), wraparound, and a k-space spike.

Usage: ``python examples/fourier_disk_masks.py`` (env: OUTDIR).
Writes ``<OUTDIR>/fourier_disk_masks.png``. CPU-friendly (2D, tiny shapes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402

# Tiny 2D work: force CPU BEFORE any backend init (jax.devices()/
# default_backend() would lock in the remote TPU — see CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mvtb_tpu.data.synthetic import make_textured_volume  # noqa: E402
from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch  # noqa: E402


def _slice2d() -> np.ndarray:
    vol, _ = make_textured_volume(np.random.RandomState(0), channels=1,
                                  spatial=(96, 96, 8))
    return np.asarray(vol[0, :, :, 4], np.float32)


def _panel(ax_img, ax_k, img: np.ndarray, title: str) -> None:
    ax_img.imshow(img, cmap="gray", origin="lower")
    ax_img.set_title(title, fontsize=8)
    ax_img.axis("off")
    k = np.fft.fftshift(np.fft.fft2(img))
    logk = np.log(np.abs(k) + 1e-9)
    ax_k.imshow(logk, cmap="gray", origin="lower")
    ax_k.set_title("log |k|", fontsize=7)
    ax_k.axis("off")


def main() -> str:
    outdir = os.environ.get("OUTDIR", "reports/mask_gallery")
    os.makedirs(outdir, exist_ok=True)

    x2d = _slice2d()
    x = jnp.asarray(x2d)[None, None]  # (B=1, C=1, H, W)
    key = jax.random.key(0)

    cases = [("clean", None)]
    for r in (8.0, 16.0, 32.0):
        cases.append((f"disk r={r:g} (low-pass)",
                      StylizeConfig(n_dims=2, disk_r=r)))
    cases.append(("disk r=16 inside_off (high-pass)",
                  StylizeConfig(n_dims=2, disk_r=16.0, disk_inside_off=True)))
    for a in (0.4, 0.7):
        cases.append((f"GibbsNoise alpha={a:g}",
                      StylizeConfig(n_dims=2, gibbs_alpha=a)))
    cases.append(("wraparound alpha=0.25",
                  StylizeConfig(n_dims=2, wrap_alpha=0.25)))
    cases.append(("k-space spike",
                  StylizeConfig(n_dims=2, spike=True,
                                spike_range=(11.0, 11.0))))

    fig, axes = plt.subplots(2, len(cases), figsize=(2.1 * len(cases), 4.6))
    for col, (title, cfg) in enumerate(cases):
        out = x2d if cfg is None else np.asarray(
            stylize_batch(x, key, cfg))[0, 0]
        _panel(axes[0, col], axes[1, col], out, title)
    fig.suptitle("k-space mask gallery (reference: fourier_images_disk_masks"
                 ".ipynb)", fontsize=10)
    fig.tight_layout()
    path = os.path.join(outdir, "fourier_disk_masks.png")
    fig.savefig(path, dpi=110)
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
