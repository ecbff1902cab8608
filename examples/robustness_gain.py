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

All reference corruption families are covered (FAMILY env knob):
``disk`` (Gibbs ringing, ``20_Gibbs_filters``), ``planes``
(``30_plane_waves_filters``), ``wrap`` (aliasing, ``50_wraparound``:
baseline 0.1197 on full wrap vs wrap0-trained 0.6212), ``sap``
(``40_salt_and_pepper``: baseline 0.4403 on sap-0.35 vs sap35 0.7125), and
``combo`` — the stacked Gibbs->planes->wrap->sap pipeline of the
``127_gibbs_spikes_wraparound_sap`` scripts
(``stylized_gibbs12p5_spikes15_wrap0p5_sap0p05_FLAIR.py:138-141``),
evaluated on the stack itself AND on each individual corruption.

Run (TPU): ``python examples/robustness_gain.py``
Env knobs: SPATIAL (e.g. "128,128,64"), STEPS, BATCH, CHUNK, FAMILY,
DISK_R, PLANE_I, WRAP_ALPHA, SAP_P, POOL, VAL_POOL (multiple of BATCH),
OUTDIR, EVAL_RADII / EVAL_INTENSITIES / EVAL_ALPHAS / EVAL_PS (comma
lists), SEED. Writes ``<OUTDIR>/robustness_gain[_<family>].json`` +
learning curves.
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
FAMILY = os.environ.get("FAMILY", "disk")  # disk | planes | wrap | sap | combo
DISK_R = float(os.environ.get("DISK_R", "12.5"))
PLANE_I = float(os.environ.get("PLANE_I", "14"))
WRAP_ALPHA = float(os.environ.get("WRAP_ALPHA", "0"))
SAP_P = float(os.environ.get("SAP_P", "0.35"))
POOL = int(os.environ.get("POOL", "64"))
VAL_POOL = int(os.environ.get("VAL_POOL", "24"))
OUTDIR = os.environ.get("OUTDIR", "reports/robustness_gain")
EVAL_RADII = [float(v) for v in os.environ.get(
    "EVAL_RADII", "9,12.5,15,20,25").split(",") if v]
EVAL_INTENSITIES = [float(v) for v in os.environ.get(
    "EVAL_INTENSITIES", "12,14,16").split(",") if v]
EVAL_ALPHAS = [float(v) for v in os.environ.get(
    "EVAL_ALPHAS", "0,0.25,0.5,0.75").split(",") if v]
EVAL_PS = [float(v) for v in os.environ.get(
    "EVAL_PS", "0.05,0.15,0.25,0.35").split(",") if v]
SEED = int(os.environ.get("SEED", "0"))
# fast_science profile (round-3 VERDICT item 7): batch 16 + plane_fast
# fused backend — both independently measured wins (RESULTS.md batch table,
# BENCHMARKS.md plane_fast row); valid here because the science is a
# relative effect (stylized vs baseline), not a reference-parity number.
FAST = os.environ.get("FAST", "0") == "1"
if FAST and "BATCH" not in os.environ:
    BATCH = 16
FFT_BACKEND = os.environ.get("FFT_BACKEND", "plane_fast" if FAST else "auto")


def _with_backend(sty):
    """Pin the profile's fused backend onto a training StylizeConfig."""
    import dataclasses

    return dataclasses.replace(sty, fft_backend=FFT_BACKEND) \
        if sty is not None else None


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


@jax.jit
def _corrupt_wrap(x, alpha):
    """Odd-k-line scaling with a TRACED alpha (one compile for the sweep)."""
    from mvtb_tpu.ops.corruptions import wrap_artifact

    return wrap_artifact(x, alpha)


@jax.jit
def _corrupt_sap(x, p, key):
    """Per-sample salt & pepper with a TRACED p (extrema are per-volume as
    in the reference transform, hence the vmap over the batch axis)."""
    from mvtb_tpu.ops.corruptions import salt_and_pepper

    u = jax.random.uniform(key, x.shape, x.dtype)
    return jax.vmap(lambda v, uu: salt_and_pepper(v, p, u=uu))(x, u)


def _evaluate(state, va_i, va_l, corrupt):
    """``corrupt``: None, a disk radius (traced — shares one compile), a
    ("wrap", alpha) / ("sap", p) tag (traced parameter), or a StylizeConfig
    applied via stylize_batch (plane-wave family)."""
    from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch
    from mvtb_tpu.train import EpochMetrics, seg_eval_step

    metrics = EpochMetrics()
    key = jax.random.key(SEED + 4242)
    for i in range(0, va_i.shape[0], BATCH):
        img = va_i[i:i + BATCH]
        if isinstance(corrupt, StylizeConfig):
            key, sub = jax.random.split(key)
            img = stylize_batch(img, sub, corrupt)
        elif isinstance(corrupt, tuple):
            kind, param = corrupt
            if kind == "wrap":
                img = _corrupt_wrap(img, jnp.float32(param))
            else:
                key, sub = jax.random.split(key)
                img = _corrupt_sap(img, jnp.float32(param), sub)
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
    elif FAMILY == "wrap":
        # 50_wraparound: alpha scales every odd k-line; 0 = full aliasing
        sty = StylizeConfig(wrap_alpha=WRAP_ALPHA, wrap_prob=1.0)
        styl_name = f"wrap{WRAP_ALPHA}"
        eval_sets = {"clean": None}
        eval_sets.update({f"wrap{a}": ("wrap", a) for a in EVAL_ALPHAS})
        diag = f"wrap{WRAP_ALPHA}"
        if diag not in eval_sets:
            eval_sets[diag] = ("wrap", WRAP_ALPHA)
    elif FAMILY == "sap":
        # 40_salt_and_pepper: impulse noise probability p
        sty = StylizeConfig(sap_p=SAP_P, sap_prob=1.0)
        styl_name = f"sap{SAP_P}"
        eval_sets = {"clean": None}
        eval_sets.update({f"sap{p}": ("sap", p) for p in EVAL_PS})
        diag = f"sap{SAP_P}"
        if diag not in eval_sets:
            eval_sets[diag] = ("sap", SAP_P)
    elif FAMILY == "combo":
        # 127_gibbs_spikes_wraparound_sap: the full stacked pipeline
        # (Gibbs r=12.5 -> plane write I=15 on the (55,55,30) shell ->
        # wrap alpha=0.5 -> sap p=0.05) applied in the reference's order,
        # fused into one k-space round trip. The registry's
        # gibbs12p5_spikes15_wrap0p5_sap0p05_FLAIR config, 4-channel here.
        shell = (55.0, 55.0, 30.0)
        sty = StylizeConfig(disk_r=12.5, disk_prob=1.0, plane_axes=shell,
                            plane_intensity=15.0, plane_prob=1.0,
                            wrap_alpha=0.5, wrap_prob=1.0,
                            sap_p=0.05, sap_prob=1.0)
        styl_name = "combo"
        eval_sets = {
            "clean": None,
            "combo": sty,
            "gibbs12.5": 12.5,
            "planes15": StylizeConfig(plane_axes=shell, plane_intensity=15.0,
                                      plane_prob=1.0),
            "wrap0.5": ("wrap", 0.5),
            "sap0.05": ("sap", 0.05),
        }
        diag = "combo"
    else:
        raise ValueError(f"unknown FAMILY {FAMILY}")

    models, histories = {}, {}
    key = jax.random.key(SEED + 1)
    for name, train_sty in [("baseline", None), (styl_name, sty)]:
        key, sub = jax.random.split(key)
        models[name], histories[name] = _train(name, _with_backend(train_sty),
                                               pool_i, pool_l, sub)

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
        # the reference's pickled Dice tables for each family (BASELINE.md)
        "reference_shape": {
            "disk": {
                "baseline_clean": 0.7433, "baseline_on_gibbs9": 0.6101,
                "stylized12p5_on_gibbs12p5": 0.7194,
                "baseline_on_gibbs12p5": 0.6777,
            },
            "planes": {
                # plane waves are catastrophic for the baseline,
                # recoverable by stylization (20_results/30_planes_waves)
                "baseline_clean": 0.7433, "baseline_on_planes17": 0.0180,
                "planes17_on_planes17": 0.7113,
            },
            "wrap": {
                # 20_results/80_common_evaluations/50_evaluations_on_wrap
                "baseline_clean": 0.7433, "baseline_on_wrap0": 0.1197,
                "wrap0_on_wrap0": 0.6212,
            },
            "sap": {
                # 20_results/40_sap
                "baseline_clean": 0.7433, "baseline_on_sap0p35": 0.4403,
                "sap35_on_sap0p35": 0.7125,
            },
            "combo": {
                # no pickled table survives for the 127_ stack; the
                # per-component tables above are the shape anchors — the
                # stacked model should hold up on EVERY component column
                "baseline_clean": 0.7433,
            },
        }[FAMILY],
    }
    out = {"spatial": SPATIAL, "steps": STEPS, "batch": BATCH,
           "family": FAMILY, "disk_r": DISK_R, "plane_i": PLANE_I,
           "wrap_alpha": WRAP_ALPHA, "sap_p": SAP_P,
           "pool": POOL, "val_pool": VAL_POOL, "fast": FAST,
           "fft_backend": FFT_BACKEND,
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
