"""CLI: run registry experiments.

    python -m mvtb_tpu.experiments list
    python -m mvtb_tpu.experiments run gibbs12p5 --epochs 2 --steps 4 \
        --workdir /tmp/gibbs12p5
    python -m mvtb_tpu.experiments domain baseline_domain --epochs 2

The config-driven replacement for invoking the reference's per-experiment
script clones (``python stylized_gibbs12p5.py`` etc.).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mvtb_tpu.experiments")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry experiment names")

    for cmd in ("run", "domain"):  # --mitigated validated below (GAN-only)
        p = sub.add_parser(cmd, help=f"{cmd} an experiment")
        p.add_argument("name")
        p.add_argument("--epochs", type=int, default=None)
        p.add_argument("--steps", type=int, default=8,
                       help="steps per epoch (synthetic data)")
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--workdir", default=None)
        p.add_argument("--quiet", action="store_true")
        p.add_argument("--fast", action="store_true",
                       help="fast_science profile: batch 16 + plane_fast "
                            "backend (non-parity synthetic runs only)")
        p.add_argument("--chunked", action="store_true",
                       help="one jitted dispatch per epoch (reference-scale "
                            "runs over the TPU tunnel)")
        p.add_argument("--mitigated", action="store_true",
                       help="GAN-collapse mitigation profile: one-sided "
                            "label smoothing 0.9 (registry.mitigated)")
        p.add_argument("--ckpt-every", type=int, default=None,
                       help="checkpoint/FID cadence in epochs (chunked runs)")

    args = parser.parse_args(argv)

    from mvtb_tpu.experiments import names, run, run_domain_experiment

    if args.cmd == "list":
        for n in names():
            print(n)
        return 0

    fn = run_domain_experiment if args.cmd == "domain" else run
    kwargs = {}
    target = args.name
    if args.cmd == "domain" and args.mitigated:
        parser.error("--mitigated is only supported with the 'run' command")
    if args.cmd == "run":
        kwargs = {"fast": args.fast, "chunked": args.chunked,
                  "ckpt_every": args.ckpt_every}
        if args.mitigated:
            from mvtb_tpu.experiments.registry import get as get_cfg, mitigated

            base = get_cfg(args.name)
            if base.kind not in ("dcgan", "recon_gan", "recon_gan_freq",
                                 "gibbs_gan"):
                parser.error(f"--mitigated applies to GAN configs only "
                             f"({args.name} is kind={base.kind!r})")
            target = mitigated(base)
    result = fn(target, epochs=args.epochs, steps_per_epoch=args.steps,
                seed=args.seed, workdir=args.workdir, verbose=not args.quiet,
                **kwargs)
    summary = {k: v for k, v in result.items()
               if k in ("best_dice", "gap", "wall_time_s")}
    print(json.dumps(summary, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
