"""Cross-corruption Dice matrix: every model evaluated on every corruption.

The reference's flagship results asset (`20_results/80_common_evaluations/
comparison_on_*.ipynb` + the pickled `model_evaluation` tables): a grid of
stylized-trained models crossed with a grid of corrupted validation sets,
showing diagonal dominance (each stylized model is best on its own
corruption) and baseline fragility. Produced here at the reference geometry
on textured synthetic data with the chunked device-loop trainer.

Run (TPU): ``python examples/cross_corruption_matrix.py``
Env knobs: SPATIAL, STEPS, BATCH, CHUNK, POOL, VAL_POOL, OUTDIR.
Writes ``<OUTDIR>/matrix.json`` + ``matrix.md`` + a grouped-bar figure.
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
CHUNK = int(os.environ.get("CHUNK", "125"))
POOL = int(os.environ.get("POOL", "48"))
VAL_POOL = int(os.environ.get("VAL_POOL", "24"))
OUTDIR = os.environ.get("OUTDIR", "reports/cross_corruption")
SEED = int(os.environ.get("SEED", "0"))
# FAST=1 -> the fast_science profile (batch 16 + plane_fast fused backend,
# registry.fast_science): non-parity synthetic-science runs only
FAST = os.environ.get("FAST", "0") == "1"
if FAST:
    BATCH = int(os.environ.get("BATCH", "16"))
# LEARNABLE=1 (default) adds the learnable-GD row: a GibbsUNet whose alpha
# trains by jax.grad on clean data; its final-alpha model is evaluated
# across the same corruption grid (round-4 VERDICT item 7)
LEARNABLE = os.environ.get("LEARNABLE", "1") == "1"


def main() -> None:
    from mvtb_tpu.data.synthetic import make_textured_volume
    from mvtb_tpu.models import UNet
    from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch
    from mvtb_tpu.train import (EpochMetrics, create_seg_state,
                                reference_optimizer, seg_eval_step,
                                train_chunked)

    os.makedirs(OUTDIR, exist_ok=True)
    print(f"pools: {POOL} train / {VAL_POOL} val at {SPATIAL}", flush=True)
    t0 = time.time()
    rng = np.random.RandomState(SEED)
    tr = [make_textured_volume(rng, 4, SPATIAL, 3) for _ in range(POOL)]
    va_rng = np.random.RandomState(SEED + 9999)
    va = [make_textured_volume(va_rng, 4, SPATIAL, 3) for _ in range(VAL_POOL)]
    pool_i = jnp.asarray(np.stack([v[0] for v in tr]))
    pool_l = jnp.asarray(np.stack([v[1] for v in tr]))
    va_i = jnp.asarray(np.stack([v[0] for v in va]))
    va_l = jnp.asarray(np.stack([v[1] for v in va]))
    del tr, va
    print(f"pools ready in {time.time() - t0:.0f}s", flush=True)

    def _cfg(**kw):
        if FAST:
            kw["fft_backend"] = "plane_fast"
        return StylizeConfig(**kw)

    shell = (55.0, 55.0, 30.0)
    train_grid = {
        "baseline": None,
        "gibbs12p5": _cfg(disk_r=12.5, disk_prob=1.0),
        "planes14": _cfg(plane_axes=shell, plane_intensity=14.0,
                              plane_prob=1.0),
        "sap0p15": _cfg(sap_p=0.15, sap_prob=1.0),
        "wrap0p5": _cfg(wrap_alpha=0.5, wrap_prob=1.0),
    }
    eval_grid = {
        "clean": None,
        "gibbs12p5": train_grid["gibbs12p5"],
        "gibbs20": _cfg(disk_r=20.0, disk_prob=1.0),
        "planes14": train_grid["planes14"],
        "planes16": _cfg(plane_axes=shell, plane_intensity=16.0,
                               plane_prob=1.0),
        "sap0p15": train_grid["sap0p15"],
        "sap0p35": _cfg(sap_p=0.35, sap_prob=1.0),
        "wrap0p5": train_grid["wrap0p5"],
        "wrap0": _cfg(wrap_alpha=0.0, wrap_prob=1.0),
    }

    models, histories = {}, {}
    key = jax.random.key(SEED + 1)
    for name, sty in train_grid.items():
        key, sub = jax.random.split(key)
        state = create_seg_state(jax.random.key(SEED),
                                 UNet(out_channels=3, dtype=jnp.bfloat16),
                                 (1,) + SPATIAL + (4,),
                                 tx=reference_optimizer())
        models[name], histories[name] = train_chunked(
            state, pool_i, pool_l, steps=STEPS, batch_size=BATCH, key=sub,
            stylize=sty, chunk=CHUNK,
            sample_rng=np.random.RandomState(SEED + 17),
            log=lambda s: print(s, flush=True), name=name)

    # learnable-GD row: GibbsUNet, alpha trained by plain jax.grad on clean
    # data (the TPU-native replacement for the reference's FD loop); the
    # final-alpha model carries its own stylization layer into evaluation,
    # exactly how the reference's layer models are evaluated
    # (``utils.py:286-311`` load_UNet -> Gibbs_UNet -> dataset_eval_multi)
    learn_eval = None
    if LEARNABLE:
        from mvtb_tpu.eval.dice import dice_scores, threshold_predictions
        from mvtb_tpu.models import GibbsUNet
        from mvtb_tpu.train.chunked import make_learnable_chunk_fn
        from mvtb_tpu.train.learnable import create_learnable_state

        key, sub = jax.random.split(key)
        lstate = create_learnable_state(
            jax.random.key(SEED), GibbsUNet(alpha_init=0.7, out_channels=3),
            (1, 4) + SPATIAL)
        lchunk = make_learnable_chunk_fn(False)
        srng = np.random.RandomState(SEED + 17)
        done, t1 = 0, time.time()
        traj = []
        while done < STEPS:
            n = min(CHUNK, STEPS - done)
            idxs = jnp.asarray(srng.randint(0, POOL, (n, BATCH)))
            lstate, sub, lloss, tr_a = lchunk(lstate, sub, pool_i, pool_l,
                                              idxs)
            done += n
            traj.extend(float(a) for a in np.asarray(tr_a))
            print(f"[learnable_gd] step {done}/{STEPS} loss "
                  f"{float(lloss):.4f} alpha {traj[-1]:.4f} "
                  f"({time.time() - t1:.0f}s)", flush=True)
        histories["learnable_gd"] = {"alpha_trajectory_tail": traj[-20:],
                                     "alpha_final": traj[-1]}

        @jax.jit
        def learn_eval(params, img_cf, lbl_cf):
            logits = lstate.apply_fn({"params": params}, img_cf)
            preds = threshold_predictions(jnp.moveaxis(logits, 1, -1))
            return dice_scores(preds, jnp.moveaxis(lbl_cf, 1, -1))

    table = {}
    eval_rows = {m: ("seg", s) for m, s in models.items()}
    if learn_eval is not None:
        eval_rows["learnable_gd"] = ("learnable", lstate)
    for mname, (kind_, state) in eval_rows.items():
        table[mname] = {}
        for ename, esty in eval_grid.items():
            metrics = EpochMetrics()
            ekey = jax.random.key(SEED + 4242)
            for i in range(0, va_i.shape[0], BATCH):
                img = va_i[i:i + BATCH]
                if esty is not None:
                    ekey, sub = jax.random.split(ekey)
                    img = stylize_batch(img, sub, esty)
                if kind_ == "seg":
                    scores = seg_eval_step(state, img, va_l[i:i + BATCH])
                else:
                    scores = learn_eval(state.params, img, va_l[i:i + BATCH])
                metrics.update(np.asarray(scores))
            res = metrics.result()
            table[mname][ename] = res
            print(f"{mname} on {ename}: {res['mean']:.4f}", flush=True)

    # diagonal-dominance summary: on each corruption, is its own stylized
    # model the best (and better than the baseline)?
    summary = {}
    for ename in eval_grid:
        if ename in ("clean",) or ename not in table:
            continue
        scores = {m: table[m][ename]["mean"] for m in table}
        best = max(scores, key=scores.get)
        summary[ename] = {"best_model": best, "scores": scores,
                          "own_beats_baseline":
                              scores[ename] > scores["baseline"]}

    out = {"spatial": SPATIAL, "steps": STEPS, "batch": BATCH, "pool": POOL,
           "val_pool": VAL_POOL, "seed": SEED, "fast": FAST, "table": table,
           "diagonal_summary": summary, "histories": histories}
    with open(os.path.join(OUTDIR, "matrix.json"), "w") as f:
        json.dump(out, f, indent=2)

    cols = list(eval_grid)
    lines = ["# Cross-corruption Dice matrix (textured synthetic, "
             f"{SPATIAL}, {STEPS} steps/model)", "",
             "| model \\ val | " + " | ".join(cols) + " |",
             "|" + "---|" * (len(cols) + 1)]
    for m in table:
        lines.append("| " + m + " | " + " | ".join(
            f"{table[m][c]['mean']:.3f}" for c in cols) + " |")
    with open(os.path.join(OUTDIR, "matrix.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))

    try:
        from mvtb_tpu.eval.plots import plot_model_performance

        perf = {m: {c: table[m][c]["mean"] for c in cols} for m in table}
        plot_model_performance(perf, os.path.join(OUTDIR, "matrix.png"),
                               title="cross-corruption Dice")
    except Exception as e:
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
