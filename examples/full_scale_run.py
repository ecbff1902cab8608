"""Full reference-scale experiment + resume drill (VERDICT round-2 item 2).

Runs the registry's ``gibbs12p5`` config at the REFERENCE's training length
— 180 epochs x 194 steps x batch 2 (``baseline.py:219,188``: 388 volumes /
batch 2), val every 2 epochs, Orbax checkpointing on — on textured
synthetic volumes, via the chunked runner path (one device dispatch per
epoch). Kill it at any point and re-run with ``--resume``: it continues
from the latest checkpoint with continuous loss/Dice curves.

    python examples/full_scale_run.py                 # start (or restart)
    python examples/full_scale_run.py --resume        # continue after kill
    python examples/full_scale_run.py --epochs 60     # shorter variant

Artifacts land in reports/full_scale/: history.json (curves), ckpt/
(Orbax full train state, latest 3), learning-curve PNGs, summary.json
(wall-clock, vol/s, best Dice, resume events).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="gibbs12p5")
    p.add_argument("--epochs", type=int, default=180)
    p.add_argument("--steps_per_epoch", type=int, default=194)
    p.add_argument("--pool", type=int, default=48,
                   help="device-resident training pool (volumes)")
    p.add_argument("--val_batches", type=int, default=12)
    p.add_argument("--out_dir", default="reports/full_scale")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from mvtb_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mvtb_tpu.experiments.registry import get
    from mvtb_tpu.experiments.runner import run

    cfg = get(args.config)
    os.makedirs(args.out_dir, exist_ok=True)
    events_path = os.path.join(args.out_dir, "summary.json")
    events = []
    if os.path.exists(events_path):
        with open(events_path) as f:
            events = json.load(f).get("events", [])

    t0 = time.time()
    result = run(cfg, epochs=args.epochs,
                 steps_per_epoch=args.steps_per_epoch, seed=args.seed,
                 workdir=args.out_dir, val_batches=args.val_batches,
                 chunked=True, resume=args.resume, pool=args.pool)
    wall = time.time() - t0

    start = result.get("resumed_from", 0)
    trained_epochs = args.epochs - start
    vols = trained_epochs * args.steps_per_epoch * cfg.batch_size
    events.append({
        "kind": "resume" if args.resume and start else "start",
        "from_epoch": start, "to_epoch": args.epochs,
        "wall_s": round(wall, 1),
        "train_vol_per_sec": round(vols / wall, 2) if wall else None,
    })
    summary = {
        "config": args.config,
        "epochs": args.epochs,
        "steps_per_epoch": args.steps_per_epoch,
        "batch_size": cfg.batch_size,
        "total_steps": args.epochs * args.steps_per_epoch,
        "best_dice": result["best_dice"],
        "final_loss": result["history"]["loss"][-1],
        "events": events,
    }
    with open(events_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
