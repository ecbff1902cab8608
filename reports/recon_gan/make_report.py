"""Render the ReconGAN recovery record: PSNR-gain curves across all runs.

    python reports/recon_gan/make_report.py
"""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = [
    ("recon_gan", "image", "image faithful (1e-4)", "tab:red", "-"),
    ("recon_gan_freq", "freq", "freq faithful (1e-4)", "tab:blue", "-"),
    ("recon_gan_mitigated", "image", "image + label smooth 0.9", "tab:red", "--"),
    ("recon_gan_freq_mitigated", "freq", "freq + label smooth 0.9", "tab:blue", "--"),
    ("recon_gan_lr2e4", "image", "image lr 2e-4", "tab:orange", ":"),
    ("recon_gan_freq_lr2e4", "freq", "freq lr 2e-4", "tab:cyan", ":"),
    ("recon_gan_gamma100", "image", "image gamma=100 diagnostic", "tab:green", "-."),
    ("gibbs_gan_recovery", "gibbs", "adversarial-gibbs (freq loss)", "tab:purple", "-"),
]

fig, ax = plt.subplots(figsize=(10, 5))
p_in = None
for d, variant, label, color, ls in RUNS:
    path = os.path.join(R, d, "recovery.json")
    if not os.path.exists(path):
        continue
    r = json.load(open(path)).get(variant)
    if r is None:
        continue
    h = r["history"]
    ax.plot([x["step"] for x in h], [x["psnr_out"] for x in h],
            color=color, ls=ls, lw=1.2, label=label)
    if variant != "gibbs":
        p_in = h[-1]["psnr_in"]
if p_in is not None:
    ax.axhline(p_in, color="gray", lw=1.0, ls=":",
               label=f"corrupted input ({p_in:.2f} dB)")
ax.set_xlabel("step")
ax.set_ylabel("PSNR of G(corrupted) vs target (dB)")
ax.set_title("ReconGAN recovery, 12,800-step runs (200 epochs x 64)")
ax.legend(fontsize=8)
ax.set_ylim(5, 25)
fig.tight_layout()
fig.savefig(os.path.join(R, "recon_gan", "psnr_curves.png"), dpi=110)
print("wrote psnr_curves.png")
