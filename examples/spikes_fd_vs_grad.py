"""FD-mode vs grad-mode trajectory comparison for the spikes layer family.

Round-4 VERDICT weak #5: the `reports/learnable_spikes_full` record moved
the spike log-intensity 11.00 -> 10.50 over 5,500 steps and asserted
"genuinely learnable" from direction alone, with no analysis of whether
that magnitude is the expected dynamics. This driver answers it with the
two estimators the framework implements, at matched data/seed/length:

* **FD** — the reference's finite-difference rule with the spikes scripts'
  constants (``spikes11_layer_domain_GD.py:262-277``: h=0.05, lr=0.1): two
  extra forward passes per step, update ``i -= 0.1 * (L(i+h) - L(i)) / h``.
  (NB: round-4's run silently fell back to grad mode — the runner gated FD
  to the gibbs family; fixed this round.)
* **grad** — the TPU-native way: intensity is a flax param updated by the
  same Adam(1e-4) as the UNet through ``jax.grad`` of the smooth
  log-magnitude spike write.

Run (TPU): ``python examples/spikes_fd_vs_grad.py``
Env knobs: EPOCHS (110), STEPS (50/epoch), OUTDIR.
Writes ``<OUTDIR>/comparison.json`` + trajectory overlay PNG.
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

EPOCHS = int(os.environ.get("EPOCHS", "110"))
STEPS = int(os.environ.get("STEPS", "50"))
OUTDIR = os.environ.get("OUTDIR", "reports/spikes_fd_vs_grad")


def main():
    from mvtb_tpu.experiments.registry import get
    from mvtb_tpu.experiments.runner import run

    os.makedirs(OUTDIR, exist_ok=True)
    base = get("spikes11_layer_GD")  # fd_mode=True, h=0.05, lr=0.1
    results = {}
    for mode, cfg in [
        ("fd", base),
        ("grad", dataclasses.replace(base, name="spikes11_layer_grad",
                                     fd_mode=False)),
    ]:
        r = run(cfg, epochs=EPOCHS, steps_per_epoch=STEPS, chunked=True,
                workdir=os.path.join(OUTDIR, mode))
        traj = [float(a) for a in r["trajectory"]]
        results[mode] = {
            "start": traj[0], "end": traj[-1],
            "delta": traj[-1] - traj[0],
            "per_1k_steps": (traj[-1] - traj[0]) / len(traj) * 1000,
            "final_loss": float(r["losses"][-1]),
            "trajectory_every_50": traj[::50],
        }
        print(f"[{mode}] intensity {traj[0]:.3f} -> {traj[-1]:.3f} "
              f"({results[mode]['per_1k_steps']:+.4f}/1k steps)", flush=True)

    with open(os.path.join(OUTDIR, "comparison.json"), "w") as f:
        json.dump({"epochs": EPOCHS, "steps_per_epoch": STEPS,
                   "fd_h": base.fd_h, "fd_lr": base.fd_lr,
                   "results": results}, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 4))
        for mode in results:
            t = results[mode]["trajectory_every_50"]
            ax.plot(np.arange(len(t)) * 50, t, label=f"{mode} mode")
        ax.set_xlabel("step"); ax.set_ylabel("spike log-intensity")
        ax.legend(); ax.set_title("spikes11: FD (h=0.05, lr=0.1) vs jax.grad")
        fig.tight_layout()
        fig.savefig(os.path.join(OUTDIR, "fd_vs_grad.png"), dpi=110)
    except Exception as e:  # noqa: BLE001
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
