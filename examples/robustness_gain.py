"""Robustness-gain experiment: stylized-trained vs baseline under corruption.

Reproduces the reference's core scientific claim end-to-end on textured
synthetic data (BraTS itself is not available in this environment): a 3D UNet
trained on Gibbs-stylized volumes outperforms the clean-trained baseline on
Gibbs-corrupted validation data, while the baseline degrades steeply
(reference shape: baseline 0.7433 clean -> 0.6101 on gibbs9; stylized
diagonal 0.7194 vs baseline 0.6777 on gibbs12.5 — BASELINE.md,
``20_results/20_Gibbs_filters/*.pickle``).

The data generator (:func:`mvtb_tpu.data.synthetic.make_textured_volume`)
puts the dominant label signal in a high-k texture band that disk filtering
at the flagship radius erases, with a weaker low-k offset surviving — the
property real MRI has and the round-1 smooth-blob data lacked.

TPU-shaped towards this environment: the training pool lives in HBM and the
loop runs as jitted ``fori_loop`` chunks (one dispatch per CHUNK steps —
per-step host dispatch over the remote-TPU tunnel costs ~0.5 s/step), and
evaluation corrupts with a *traced* disk radius so the whole radius sweep
shares one compile.

Run (TPU): ``python examples/robustness_gain.py``
Env knobs: SPATIAL (e.g. "128,128,64"), STEPS, BATCH, CHUNK, DISK_R, POOL,
VAL_POOL (multiple of BATCH), OUTDIR, EVAL_RADII (comma list), SEED.
Writes ``<OUTDIR>/robustness_gain.json`` + learning curves.
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
STEPS = int(os.environ.get("STEPS", "4000"))
BATCH = int(os.environ.get("BATCH", "8"))
CHUNK = int(os.environ.get("CHUNK", "100"))
FAMILY = os.environ.get("FAMILY", "disk")  # disk | planes
DISK_R = float(os.environ.get("DISK_R", "12.5"))
PLANE_I = float(os.environ.get("PLANE_I", "14"))
POOL = int(os.environ.get("POOL", "64"))
VAL_POOL = int(os.environ.get("VAL_POOL", "24"))
OUTDIR = os.environ.get("OUTDIR", "reports/robustness_gain")
EVAL_RADII = [float(v) for v in os.environ.get(
    "EVAL_RADII", "9,12.5,15,20,25").split(",") if v]
EVAL_INTENSITIES = [float(v) for v in os.environ.get(
    "EVAL_INTENSITIES", "12,14,16").split(",") if v]
SEED = int(os.environ.get("SEED", "0"))


def _make_pool(seed: int, n: int):
    from mvtb_tpu.data.synthetic import make_textured_volume

    rng = np.random.RandomState(seed)
    vols = [make_textured_volume(rng, 4, SPATIAL, 3) for _ in range(n)]
    return (np.stack([v[0] for v in vols]), np.stack([v[1] for v in vols]))


def _train(name, stylize, pool_i, pool_l, key):
    from mvtb_tpu.models import UNet
    from mvtb_tpu.train import (create_seg_state, reference_optimizer,
                                train_chunked)

    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(SEED), model,
                             (1,) + SPATIAL + (4,),
                             tx=reference_optimizer())
    return train_chunked(
        state, pool_i, pool_l, steps=STEPS, batch_size=BATCH, key=key,
        stylize=stylize, chunk=CHUNK,
        sample_rng=np.random.RandomState(SEED + 17),
        log=lambda s: print(s, flush=True), name=name)


@jax.jit
def _corrupt_disk(x, r):
    """Reference-geometry disk low-pass with a TRACED radius: the whole
    evaluation radius sweep shares one compiled program (raw-coordinate mask
    as in ops/fused.py)."""
    from mvtb_tpu.ops.fused import _raw_dist_sq

    axes = (-3, -2, -1)
    k = jnp.fft.fftn(x, axes=axes)
    d2 = _raw_dist_sq(x.shape[-3:], (0.0,) * 3)
    return jnp.fft.ifftn(k * (d2 < r * r).astype(jnp.float32),
                         axes=axes).real.astype(x.dtype)


def _evaluate(state, va_i, va_l, corrupt):
    """``corrupt``: None, a disk radius (traced — shares one compile), or a
    StylizeConfig applied via stylize_batch (plane-wave family)."""
    from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch
    from mvtb_tpu.train import EpochMetrics, seg_eval_step

    metrics = EpochMetrics()
    key = jax.random.key(SEED + 4242)
    for i in range(0, va_i.shape[0], BATCH):
        img = va_i[i:i + BATCH]
        if isinstance(corrupt, StylizeConfig):
            key, sub = jax.random.split(key)
            img = stylize_batch(img, sub, corrupt)
        elif corrupt is not None:
            img = _corrupt_disk(img, jnp.float32(corrupt))
        scores = seg_eval_step(state, img, va_l[i:i + BATCH])
        metrics.update(np.asarray(scores))
    return metrics.result()


def main() -> None:
    from mvtb_tpu.ops.fused import StylizeConfig

    assert VAL_POOL % BATCH == 0, "VAL_POOL must be a multiple of BATCH " \
        "(each distinct batch shape costs a 30s+ remote compile)"
    os.makedirs(OUTDIR, exist_ok=True)
    print(f"building pools: train {POOL}, val {VAL_POOL} at {SPATIAL}", flush=True)
    t0 = time.time()
    tr_imgs, tr_lbls = _make_pool(SEED, POOL)
    va_imgs, va_lbls = _make_pool(SEED + 9999, VAL_POOL)
    print(f"pools ready in {time.time() - t0:.0f}s", flush=True)
    pool_i, pool_l = jnp.asarray(tr_imgs), jnp.asarray(tr_lbls)
    va_i, va_l = jnp.asarray(va_imgs), jnp.asarray(va_lbls)
    del tr_imgs, tr_lbls, va_imgs, va_lbls

    if FAMILY == "disk":
        sty = StylizeConfig(disk_r=DISK_R, disk_prob=1.0)
        styl_name = f"gibbs{DISK_R}"
        eval_sets = {"clean": None}
        eval_sets.update({f"gibbs{r}": r for r in EVAL_RADII})
        diag = f"gibbs{DISK_R}"
    elif FAMILY == "planes":
        # the reference's plane-wave family: one magnitude write on the
        # (55, 55, 30) shell per sample (stylized_planes14.py:76-78,133)
        sty = StylizeConfig(plane_axes=(55.0, 55.0, 30.0),
                            plane_intensity=PLANE_I, plane_prob=1.0)
        styl_name = f"planes{PLANE_I}"
        eval_sets = {"clean": None}
        eval_sets.update({
            f"planes{i}": StylizeConfig(plane_axes=(55.0, 55.0, 30.0),
                                        plane_intensity=float(i),
                                        plane_prob=1.0)
            for i in EVAL_INTENSITIES})
        diag = f"planes{PLANE_I}"
    else:
        raise ValueError(f"unknown FAMILY {FAMILY}")

    models, histories = {}, {}
    key = jax.random.key(SEED + 1)
    for name, train_sty in [("baseline", None), (styl_name, sty)]:
        key, sub = jax.random.split(key)
        models[name], histories[name] = _train(name, train_sty, pool_i,
                                               pool_l, sub)

    table = {}
    for mname, state in models.items():
        table[mname] = {}
        for ename, corrupt in eval_sets.items():
            res = _evaluate(state, va_i, va_l, corrupt)
            table[mname][ename] = res
            print(f"eval {mname} on {ename}: mean {res['mean']:.4f} "
                  f"per-class {[round(v, 4) for v in res['per_class']]}",
                  flush=True)
    base_clean = table["baseline"]["clean"]["mean"]
    base_corr = table["baseline"][diag]["mean"]
    styl_corr = table[diag][diag]["mean"]
    effect = {
        "baseline_clean": base_clean,
        "baseline_on_corrupted": base_corr,
        "stylized_on_corrupted": styl_corr,
        "baseline_degradation": base_clean - base_corr,
        "robustness_gain": styl_corr - base_corr,
        "effect_reproduced": bool(styl_corr > base_corr
                                  and (base_clean - base_corr) > 0.05),
        "reference_shape": ({
            "baseline_clean": 0.7433, "baseline_on_gibbs9": 0.6101,
            "stylized12p5_on_gibbs12p5": 0.7194,
            "baseline_on_gibbs12p5": 0.6777,
        } if FAMILY == "disk" else {
            # 20_results/30_planes_waves pickles (BASELINE.md): plane waves
            # are catastrophic for the baseline, recoverable by stylization
            "baseline_clean": 0.7433, "baseline_on_planes17": 0.0180,
            "planes17_on_planes17": 0.7113,
        }),
    }
    out = {"spatial": SPATIAL, "steps": STEPS, "batch": BATCH,
           "family": FAMILY, "disk_r": DISK_R, "plane_i": PLANE_I,
           "pool": POOL, "val_pool": VAL_POOL,
           "seed": SEED, "table": table, "effect": effect,
           "histories": histories}
    suffix = "" if FAMILY == "disk" else f"_{FAMILY}"
    path = os.path.join(OUTDIR, f"robustness_gain{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(effect, indent=2))
    print(f"wrote {path}")

    try:
        from mvtb_tpu.eval.plots import save_learning_curves

        for name, hist in histories.items():
            save_learning_curves(
                {"loss": [h["loss"] for h in hist], "dice": [], "epochs": []},
                os.path.join(OUTDIR, f"loss_{name}.png"), 1, title=name)
    except Exception as e:  # plots are best-effort on a headless host
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
