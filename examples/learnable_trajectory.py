"""Learnable-Gibbs alpha trajectories: finite differences vs jax.grad.

The reference trains ``Gibbs_UNet`` with its alpha updated by two extra
forward passes per step (``gibbs0p7_layer_domain_GD.py:252-298``); this
framework's native mode moves the same parameter with plain ``jax.grad``
through the soft mask. This script runs both modes side by side and writes
the trajectory artifact the reference logs (``gibbs_trajectory_*.txt`` +
plot), demonstrating the grad path tracks the FD path without the 3x
forward cost.

Run (TPU): ``python examples/learnable_trajectory.py``
Env: STEPS, BATCH, SPATIAL, ALPHA0, OUTDIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

SPATIAL = tuple(int(v) for v in os.environ.get("SPATIAL", "64,64,32").split(","))
STEPS = int(os.environ.get("STEPS", "240"))
BATCH = int(os.environ.get("BATCH", "4"))
ALPHA0 = float(os.environ.get("ALPHA0", "0.7"))
OUTDIR = os.environ.get("OUTDIR", "reports/learnable_gd")
SEED = int(os.environ.get("SEED", "0"))


def main() -> None:
    from mvtb_tpu.data.synthetic import make_textured_volume
    from mvtb_tpu.models import GibbsUNet
    from mvtb_tpu.train.learnable import (create_learnable_state,
                                          fd_train_step, learnable_train_step)

    os.makedirs(OUTDIR, exist_ok=True)
    rng = np.random.RandomState(SEED)
    pool = [make_textured_volume(rng, 1, SPATIAL, 1) for _ in range(16)]
    imgs = np.stack([v[0] for v in pool])
    lbls = np.stack([v[1] for v in pool])

    results = {}
    for mode in ("fd", "grad"):
        model = GibbsUNet(alpha_init=ALPHA0, hard=(mode == "fd"),
                          out_channels=1, channels=(8, 16, 32),
                          strides=(2, 2), num_res_units=1)
        state = create_learnable_state(
            jax.random.key(SEED), model, (BATCH, 1) + SPATIAL)
        key = jax.random.key(SEED + 1)
        srng = np.random.RandomState(SEED + 7)
        traj, losses = [], []
        t0 = time.time()
        for step in range(STEPS):
            idx = srng.randint(0, imgs.shape[0], BATCH)
            img = jnp.asarray(imgs[idx])
            lbl = jnp.asarray(lbls[idx])
            key, sub = jax.random.split(key)
            if mode == "fd":
                state, loss, alpha = fd_train_step(state, img, lbl, sub,
                                                   h=0.01, lr=0.02)
            else:
                state, loss, alpha = learnable_train_step(state, img, lbl, sub)
            traj.append(float(alpha))
            losses.append(float(loss))
            if step % 40 == 0:
                print(f"[{mode}] step {step}/{STEPS} loss {losses[-1]:.4f} "
                      f"alpha {traj[-1]:.4f} ({time.time() - t0:.0f}s)",
                      flush=True)
        results[mode] = {"trajectory": traj, "losses": losses,
                         "final_alpha": traj[-1],
                         "wall_s": time.time() - t0}
        np.savetxt(os.path.join(OUTDIR, f"gibbs_trajectory_{mode}.txt"),
                   np.asarray(traj))

    with open(os.path.join(OUTDIR, "learnable_trajectories.json"), "w") as f:
        json.dump({"alpha0": ALPHA0, "steps": STEPS, "spatial": SPATIAL,
                   **{m: {k: v for k, v in r.items() if k != "trajectory"}
                      for m, r in results.items()}}, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for mode, r in results.items():
            ax.plot(r["trajectory"], label=f"{mode} (final "
                    f"{r['final_alpha']:.3f}, {r['wall_s']:.0f}s)")
        ax.set_xlabel("step")
        ax.set_ylabel("alpha")
        ax.set_title(f"Learnable Gibbs alpha from {ALPHA0}: FD vs jax.grad")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(OUTDIR, "alpha_trajectories.png"))
        print("wrote", os.path.join(OUTDIR, "alpha_trajectories.png"))
    except Exception as e:
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
