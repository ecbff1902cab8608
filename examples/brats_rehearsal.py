"""Real-data drop-in rehearsal: the full BraTS experiment flow as ONE command
(VERDICT round-2 item 3).

    python examples/brats_rehearsal.py --root_dir /data/decathlon

runs, in order, exactly what a reference user runs across
``baseline.py`` + ``comparison_on_gibbs.ipynb`` (``utils.py:159-235``):

1. **ingest + preprocess** — Decathlon ``dataset.json`` tree of ``.nii.gz``
   volumes through the reference train pipeline (spacing 1.5/1.5/2.0, RAS,
   crop, nonzero-normalize);
2. **train** — 3D ResUNet 4->3 with Dice loss, jitted chunked steps on the
   TPU, Orbax checkpoint at the end;
3. **sweep** — ``BratsValIterDataset`` across >= 3 corruption levels
   (clean + Gibbs disk radii);
4. **tables** — ``ModelEvaluation.add_eval`` per dataset ->
   ``save()`` JSON + pickle;
5. **plot** — ``plot_model_performance`` PNG.

When no ``dataset.json`` exists under ``--root_dir`` the script synthesizes
a textured on-disk tree first (``--synthesize`` forces this) via the
package's own NIfTI writer — so the whole flow is rehearsed end-to-end
today, and when real BraTS lands the only change is ``--root_dir``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root_dir", required=True,
                   help="Decathlon root (contains Task01_BrainTumour)")
    p.add_argument("--out_dir", default="reports/brats_rehearsal")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--roi", type=int, nargs=3, default=[128, 128, 64])
    p.add_argument("--pixdim", type=float, nargs=3, default=[1.5, 1.5, 2.0])
    p.add_argument("--gibbs_radii", type=float, nargs="+",
                   default=[25.0, 15.0, 9.0],
                   help="disk radii for the corruption sweep")
    p.add_argument("--synthesize", action="store_true",
                   help="force building a synthetic tree at root_dir")
    p.add_argument("--n_volumes", type=int, default=12,
                   help="synthetic tree size")
    p.add_argument("--raw_size", type=int, nargs=3, default=[144, 144, 80],
                   help="synthetic raw volume size (pre-crop)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    import numpy as np

    from mvtb_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mvtb_tpu.data.brats_sweep import BratsValIterDataset
    from mvtb_tpu.data.nifti import DecathlonDataset
    from mvtb_tpu.data.pipeline import brats_train_pipeline
    from mvtb_tpu.data.synthetic import build_decathlon_tree
    from mvtb_tpu.eval.harness import ModelEvaluation
    from mvtb_tpu.eval.plots import plot_model_performance
    from mvtb_tpu.models import UNet
    from mvtb_tpu.train.checkpoint import CheckpointManager
    from mvtb_tpu.train.chunked import train_chunked
    from mvtb_tpu.train.seg import create_seg_state
    from mvtb_tpu.transforms import RandFourierDiskMaskd

    manifest = os.path.join(args.root_dir, "Task01_BrainTumour",
                            "dataset.json")
    if args.synthesize or not os.path.exists(manifest):
        print(f"[rehearsal] no dataset at {manifest}; synthesizing "
              f"{args.n_volumes} textured volumes {tuple(args.raw_size)}")
        # affine matches the target pixdim so the synthetic leg measures the
        # full pipeline without a host resample of made-up geometry; real
        # BraTS (1mm iso) exercises the resampler through the same code path
        build_decathlon_tree(args.root_dir, n=args.n_volumes,
                             spatial=tuple(args.raw_size), kind="textured",
                             seed=args.seed,
                             affine=np.diag(list(args.pixdim) + [1.0]))

    roi = tuple(args.roi)
    t0 = time.time()

    # 1. ingest + preprocess the training section (one random crop per
    # volume -> device-resident pool; the TPU lesson from round 2: feed the
    # chip from a pool, not per-step host dispatch)
    train_ds = DecathlonDataset(
        args.root_dir, "Task01_BrainTumour",
        transform=brats_train_pipeline(roi_size=roi,
                                       pixdim=tuple(args.pixdim)),
        section="training",
        cache_dir=os.path.join(args.out_dir, "cache_train"))
    imgs, lbls = [], []
    for i in range(len(train_ds)):
        s = train_ds[i]
        imgs.append(np.asarray(s["image"], np.float32))
        lbls.append(np.asarray(s["label"], np.float32))
    pool_i = jnp.asarray(np.stack(imgs))
    pool_l = jnp.asarray(np.stack(lbls))
    print(f"[rehearsal] preprocessed {len(imgs)} training volumes "
          f"{pool_i.shape} in {time.time() - t0:.0f}s")

    # 2. train
    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(args.seed), model,
                             (1,) + roi + (4,))
    state, losses = train_chunked(
        state, pool_i, pool_l, steps=args.steps, batch_size=args.batch,
        key=jax.random.key(args.seed + 1), chunk=args.chunk,
        name="rehearsal")
    ckpt_dir = os.path.abspath(os.path.join(args.out_dir, "ckpt"))
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(args.steps, state)
    mgr.wait()
    mgr.close()
    print(f"[rehearsal] trained {args.steps} steps; checkpoint at {ckpt_dir}")

    # 3. corruption sweep over the validation section (reference
    # BratsValIterDataset semantics: val pipeline + appended corruption)
    sweep_transforms = {"baseline_data": None}
    for r in args.gibbs_radii:
        sweep_transforms[f"gibbs{r:g}_data"] = RandFourierDiskMaskd(
            keys="image", r=r, inside_off=False, prob=1.0)
    sweep = BratsValIterDataset(
        args.root_dir, cache_num=50, transforms=sweep_transforms,
        return_loader=True, roi_size=roi, pixdim=tuple(args.pixdim))

    # 4. evaluation tables
    me = ModelEvaluation(model.apply, state.params,
                         instance_name="rehearsal_model", in_channels=4,
                         out_channels=3)
    for name, loader in sweep:
        me.add_eval(name, loader)
        print(f"[rehearsal] {name}: {me.eval_dict[name]}")
    table_path = me.save(os.path.join(args.out_dir, "rehearsal_model"))

    # 5. plot
    png = plot_model_performance({"rehearsal_model": me.eval_dict},
                                 os.path.join(args.out_dir,
                                              "model_performance.png"))
    summary = {
        "root_dir": args.root_dir,
        "steps": args.steps,
        "final_loss": losses[-1]["loss"] if losses else None,
        "eval": {k: list(v) if isinstance(v, tuple) else v
                 for k, v in me.eval_dict.items()},
        "tables": table_path,
        "plot": png,
        "checkpoint": ckpt_dir,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[rehearsal] done in {summary['wall_s']}s -> {args.out_dir}")
    return summary


if __name__ == "__main__":
    main()
