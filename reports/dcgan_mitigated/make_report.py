"""Render the reference-length DCGAN run's stability record from
history.json (round-3 VERDICT item 2 / weak #4: replace the 240-step GAN
evidence with a >=10k-step record).

    python reports/dcgan_full/make_report.py
"""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

D = os.path.dirname(os.path.abspath(__file__))
h = json.load(open(os.path.join(D, "history.json")))
steps = len(h["g_loss"])

fig, axes = plt.subplots(3, 1, figsize=(10, 10), sharex=True)
x = np.arange(1, steps + 1)
axes[0].plot(x, h["g_loss"], lw=0.5, label="G loss")
axes[0].plot(x, h["d_loss"], lw=0.5, label="D loss")
axes[0].set_yscale("symlog", linthresh=1.0)
axes[0].legend()
axes[0].set_title(f"DCGAN + one-sided label smoothing 0.9 ({steps} steps)")
axes[1].plot(x, h["D_x"], lw=0.5, label="D(x)")
axes[1].plot(x, h["D_G_z1"], lw=0.5, label="D(G(z)) pre-G-update")
axes[1].plot(x, h["D_G_z2"], lw=0.5, label="D(G(z)) post-G-update")
axes[1].axhline(0.5, color="gray", ls=":", lw=0.8)
axes[1].legend()
axes[1].set_ylabel("sigmoid(D)")
fe = np.asarray(h.get("fid_epochs", []))
axes[2].plot(fe * 64, h.get("fid", []), "o-", label="frozen-encoder FID")
axes[2].legend()
axes[2].set_xlabel("step")
fig.tight_layout()
fig.savefig(os.path.join(D, "stability_curves.png"), dpi=110)
print("wrote stability_curves.png;",
      f"{steps} steps, {len(fe)} FID points")
