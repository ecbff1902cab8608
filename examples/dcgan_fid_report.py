"""DCGAN training + FID report: quantitative GAN evaluation artifact.

The reference's DCGAN (``50_reconstruction/dcgan.py``) is judged by eye
(fixed-noise grids). This trains the registry's ``dcgan`` config and scores
a **frozen-encoder** Frechet distance (``mvtb_tpu.eval.fid``, round 3: a
fixed-seed feature net, so the curve is comparable across rounds and across
runs — the round-2 discriminator-feature variant was not) at several
checkpoints, writing samples + the FID curve.

Run (TPU): ``python examples/dcgan_fid_report.py``
Env: ROUNDS, STEPS_PER_ROUND, OUTDIR.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ROUNDS = int(os.environ.get("ROUNDS", "4"))
STEPS = int(os.environ.get("STEPS_PER_ROUND", "60"))
OUTDIR = os.environ.get("OUTDIR", "reports/dcgan_fid")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mvtb_tpu.eval.fid import dcgan_fid
    from mvtb_tpu.experiments import get
    from mvtb_tpu.experiments.runner import _slices_iter
    from mvtb_tpu.models import Discriminator, Generator
    from mvtb_tpu.train.gan import create_gan_state, dcgan_step

    os.makedirs(OUTDIR, exist_ok=True)
    cfg = get("dcgan")
    key = jax.random.key(0)
    data_it = _slices_iter(cfg, 0, cfg.batch_size)

    g = Generator(nz=cfg.nz, ngf=64, nc=cfg.in_channels)
    d = Discriminator(nc=cfg.in_channels, ndf=64)
    g_state = create_gan_state(key, g, (cfg.batch_size, 1, 1, cfg.nz),
                               lr=cfg.gan_lr, beta1=cfg.gan_beta1)
    d_state = create_gan_state(jax.random.fold_in(key, 1), d,
                               (cfg.batch_size,) + cfg.spatial
                               + (cfg.in_channels,),
                               lr=cfg.gan_lr, beta1=cfg.gan_beta1)

    fid_curve = []
    real_eval = [next(data_it) for _ in range(4)]
    for rnd in range(ROUNDS):
        for _ in range(STEPS):
            real = jnp.asarray(next(data_it))
            key, kz = jax.random.split(key)
            z = jax.random.normal(kz, (real.shape[0], 1, 1, cfg.nz))
            g_state, d_state, m = dcgan_step(g_state, d_state, real, z)
        fid = dcgan_fid(g_state, d_state, real_eval,
                        jax.random.fold_in(key, 99), nz=cfg.nz)
        fid_curve.append({"step": (rnd + 1) * STEPS, "fid": float(fid),
                          "g_loss": float(m["g_loss"]),
                          "d_loss": float(m["d_loss"])})
        print(f"round {rnd + 1}/{ROUNDS}: step {(rnd + 1) * STEPS} "
              f"FID {fid:.2f} G {float(m['g_loss']):.3f} "
              f"D {float(m['d_loss']):.3f}", flush=True)

    with open(os.path.join(OUTDIR, "fid_curve.json"), "w") as f:
        json.dump({"config": "dcgan", "steps_per_round": STEPS,
                   "curve": fid_curve}, f, indent=2)

    from mvtb_tpu.eval.plots import save_image_grid

    z = jax.random.normal(jax.random.key(123), (16, 1, 1, cfg.nz))
    fake = g_state.apply_fn({"params": g_state.params,
                             "batch_stats": g_state.batch_stats},
                            z, train=False)
    save_image_grid(np.asarray(fake), os.path.join(OUTDIR, "samples.png"),
                    nrow=4, title="DCGAN samples")
    print("wrote", OUTDIR)


if __name__ == "__main__":
    main()
