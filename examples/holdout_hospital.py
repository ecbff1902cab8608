"""Hold-out-hospital experiment: does stylization shrink the generalization gap?

The reference's institutional-distribution claim (``10_scripts/
300_instutional_distribution/baseline_domain.py`` + the ``stylized_*_domain``
variants, evaluated in ``TCGA_hospital_distribution_test.ipynb``): a model
trained on three hospitals and evaluated on a fourth pays a generalization
gap, and k-space stylization at train time shrinks it by erasing
institution-specific acquisition signatures.

Demonstrated here end-to-end on textured synthetic hospitals
(:func:`mvtb_tpu.data.tcga.textured_hospital_samples` — real TCGA volumes
are unavailable in this environment): each hospital's healthy tissue carries
a scanner-specific high-k texture band, tumor suppresses it, and a weaker
band-independent mean offset is the domain-invariant cue. All bands lie
outside the r=12.5 disk, so the gibbs12.5-stylized model never sees the
hospital signatures and must learn the invariant cue.

TPU-shaped: pools live in HBM, training runs as jitted ``fori_loop`` chunks
(mvtb_tpu.train.train_chunked). Evaluation follows the reference protocol:
each model is scored under its OWN val pipeline — the domain scripts put the
disk mask in the val transform too (``gibbs15_domain.py:120-136``) — with a
clean-input Dice kept as a diagnostic.

Run (TPU): ``python examples/holdout_hospital.py``
Env knobs: SPATIAL, STEPS, BATCH, CHUNK, N_PER_HOSPITAL, DISK_R, OUTDIR, SEED.
Writes ``<OUTDIR>/holdout_hospital.json`` (+ learning curves).
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

SPATIAL = tuple(int(v) for v in os.environ.get("SPATIAL", "128,128,64").split(","))
STEPS = int(os.environ.get("STEPS", "2500"))
BATCH = int(os.environ.get("BATCH", "8"))
EVAL_BATCH = int(os.environ.get("EVAL_BATCH", "4"))
CHUNK = int(os.environ.get("CHUNK", "100"))
N_PER_HOSPITAL = int(os.environ.get("N_PER_HOSPITAL", "16"))
DISK_R = float(os.environ.get("DISK_R", "12.5"))
OUTDIR = os.environ.get("OUTDIR", "reports/holdout_hospital")
SEED = int(os.environ.get("SEED", "0"))
# comma list of training arms: baseline, gibbs (disk_r=DISK_R), spikes
# (intensity 10 point write — does NOT remove the hospital band: negative
# control), sap (p=0.15 image-domain impulse — also leaves the band:
# second negative control)
FAMILIES = [f for f in os.environ.get("FAMILIES", "baseline,gibbs").split(",") if f]

HOSPITALS = ["hospital_A", "hospital_B", "hospital_C"]


def _stack(samples):
    # channel-first (B, C, *spatial) — the package's API-surface layout;
    # the train/eval steps transpose to channel-last internally
    imgs = np.stack([s["image"] for s in samples])
    lbls = np.stack([s["label"] for s in samples])
    return imgs.astype(np.float32), lbls.astype(np.float32)


def _make_pools():
    """Same membership protocol as data.tcga.domain_loaders(kind="textured"):
    per-hospital seeds seed+i, 0.75/0.25 partition at seed, holdout seed+99."""
    from mvtb_tpu.data.tcga import partition_dataset, textured_hospital_samples

    train_samples, val_sets = [], {}
    for i, hospital in enumerate(HOSPITALS):
        samples = textured_hospital_samples(hospital, N_PER_HOSPITAL,
                                            SEED + i, SPATIAL)
        tr, va = partition_dataset(samples, (0.75, 0.25), seed=SEED)
        train_samples += tr
        val_sets[hospital] = _stack(va)
    val_sets["holdout"] = _stack(textured_hospital_samples(
        "holdout", max(N_PER_HOSPITAL // 2, EVAL_BATCH), SEED + 99, SPATIAL))
    return _stack(train_samples), val_sets


def _train(name, stylize, pool_i, pool_l, key):
    from mvtb_tpu.models import UNet
    from mvtb_tpu.train import (create_seg_state, reference_optimizer,
                                train_chunked)

    model = UNet(out_channels=1, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(SEED), model,
                             (1,) + SPATIAL + (1,),
                             tx=reference_optimizer())
    return train_chunked(
        state, pool_i, pool_l, steps=STEPS, batch_size=BATCH, key=key,
        stylize=stylize, chunk=CHUNK,
        sample_rng=np.random.RandomState(SEED + 17),
        log=lambda s: print(s, flush=True), name=name)


def _evaluate(state, imgs, lbls, cfg=None):
    """Dice under a model's OWN val pipeline. The reference's domain scripts
    put the disk mask in the val transform as well as the train transform
    (``gibbs15_domain.py:120-136``, ``RandFourierDiskMaskd(..., prob=1.)`` in
    both), so the stylized model is evaluated on stylized inputs — round-2
    lesson: evaluating it on clean data is off-protocol AND off-manifold
    (texture energy it never saw), and sinks its Dice to ~0.2."""
    from mvtb_tpu.ops.fused import stylize_batch
    from mvtb_tpu.train import EpochMetrics, seg_eval_step

    metrics = EpochMetrics()
    for i in range(0, imgs.shape[0], EVAL_BATCH):
        xb = jnp.asarray(imgs[i:i + EVAL_BATCH])
        if cfg is not None:  # deterministic for a prob=1 fixed-r disk mask
            xb = stylize_batch(xb, jax.random.key(0), cfg)
        scores = seg_eval_step(state, xb, jnp.asarray(lbls[i:i + EVAL_BATCH]))
        metrics.update(np.asarray(scores))
    return metrics.result()["mean"]


def main() -> None:
    from mvtb_tpu.data.tcga import generalization_gap
    from mvtb_tpu.ops.fused import StylizeConfig

    os.makedirs(OUTDIR, exist_ok=True)
    t0 = time.time()
    print(f"building hospital pools at {SPATIAL}", flush=True)
    (tr_i, tr_l), val_sets = _make_pools()
    for k, (vi, _) in val_sets.items():
        assert vi.shape[0] % EVAL_BATCH == 0, (k, vi.shape)
    print(f"pools ready in {time.time() - t0:.0f}s: train {tr_i.shape}, "
          + ", ".join(f"{k} {v[0].shape[0]}" for k, v in val_sets.items()),
          flush=True)
    pool_i, pool_l = jnp.asarray(tr_i), jnp.asarray(tr_l)

    # (name, train-time stylize, eval-protocol stylize). Stylization arms
    # keep the corruption in the val pipeline (reference protocol); the
    # AUGMENTATION arm mirrors the reference's 30_augmentation family
    # (RandGibbsNoised("image", 0.1, alpha=(0., 0.4)),
    # baseline_domain_augment_alpha0p4.py:118) and is evaluated CLEAN.
    aug = StylizeConfig(gibbs_alpha=(0.0, 0.4), gibbs_prob=0.1)
    arm_cfgs = {
        "baseline": ("baseline", None, None),
        "gibbs": (f"gibbs{DISK_R}",
                  StylizeConfig(disk_r=DISK_R, disk_prob=1.0), "same"),
        "spikes": ("spikes10",
                   StylizeConfig(spike=True, spike_range=(10.0, 10.0),
                                 spike_prob=1.0), "same"),
        "sap": ("sap0p15", StylizeConfig(sap_p=0.15, sap_prob=1.0), "same"),
        "gibbs_aug": ("gibbs_aug0p4", aug, None),
    }
    results, histories = {}, {}
    key = jax.random.key(SEED + 1)
    for name, train_sty, eval_mode in [arm_cfgs[f] for f in FAMILIES]:
        eval_sty = train_sty if eval_mode == "same" else None
        key, sub = jax.random.split(key)
        state, histories[name] = _train(name, train_sty, pool_i, pool_l, sub)
        eval_dict, clean_dict = {}, {}
        for hospital, (vi, vl) in val_sets.items():
            # protocol eval: the model's own val pipeline (disk mask included
            # for the stylized model, as in the reference's val_transform;
            # augmentation arms evaluate clean, as the reference's
            # 30_augmentation scripts do)
            eval_dict[hospital] = _evaluate(state, vi, vl, cfg=eval_sty)
            clean_dict[hospital] = (eval_dict[hospital] if eval_sty is None
                                    else _evaluate(state, vi, vl))
            print(f"eval {name} on {hospital}: {eval_dict[hospital]:.4f} "
                  f"(clean diagnostic {clean_dict[hospital]:.4f})", flush=True)
        gap = generalization_gap(eval_dict)
        results[name] = {"eval_dict": eval_dict, "clean_eval": clean_dict,
                         "gap": gap}
        print(f"[{name}] in-dist {gap['in_dist_mean']:.4f} holdout "
              f"{gap['holdout']:.4f} gap {gap['gap']:.4f} "
              f"(normalized {gap['normalized_gap']:.3f})", flush=True)

    effect = {name: {"gap": r["gap"]["gap"],
                     "normalized_gap": r["gap"]["normalized_gap"]}
              for name, r in results.items()}
    if "baseline" in results and f"gibbs{DISK_R}" in results:
        base_g = results["baseline"]["gap"]
        styl_g = results[f"gibbs{DISK_R}"]["gap"]
        effect.update({
            "baseline_gap": base_g["gap"],
            "stylized_gap": styl_g["gap"],
            "gap_shrunk": bool(styl_g["gap"] < base_g["gap"]),
            "baseline_normalized_gap": base_g["normalized_gap"],
            "stylized_normalized_gap": styl_g["normalized_gap"],
        })
    out = {"spatial": SPATIAL, "steps": STEPS, "batch": BATCH,
           "n_per_hospital": N_PER_HOSPITAL, "disk_r": DISK_R, "seed": SEED,
           "results": results, "effect": effect, "histories": histories,
           "wall_s": round(time.time() - t0, 1)}
    path = os.path.join(OUTDIR, "holdout_hospital.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}; gaps: " + ", ".join(
        f"{n} {r['gap']['gap']:+.4f}" for n, r in results.items()))


if __name__ == "__main__":
    main()
