"""Single-chip NO-CROP training probe: full-volume BraTS seg step on TPU.

The reference crops every volume to 128x128x64 because a full 4x240x240x155
volume does not fit its training budget (``baseline.py:128-130``). The TPU
rebuild's claim (SURVEY §5 "big single sample") is that the crop can be
deleted: fused on-device k-space stylization + bf16 UNet compute on full
volumes, spatially sharded across a mesh when one chip is not enough. This
probe measures the single-chip half: one full-volume train step (B=1, bf16
model compute, f32 params/optimizer, flagship Gibbs disk stylization inside
the step), timed with the device-loop method (the tunnel's
``block_until_ready`` does not block — see CLAUDE.md), OOM boundary
recorded if it does not fit.

Run (TPU): ``python examples/fullvol_tpu_probe.py``
Env knobs: SPATIAL (default 240,240,160 — D padded 155->160 for the
stride-16 UNet), BATCH, OUTDIR.
Writes ``<OUTDIR>/fullvol.json``.
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

SPATIAL = tuple(int(v) for v in os.environ.get("SPATIAL", "240,240,160").split(","))
BATCH = int(os.environ.get("BATCH", "1"))
OUTDIR = os.environ.get("OUTDIR", "reports/fullvol_probe")


def probe(spatial, batch):
    """(ms/step, vol/s) for the full stylize+train step, or raises."""
    from mvtb_tpu.models import UNet
    from mvtb_tpu.ops.fused import StylizeConfig
    from mvtb_tpu.train import create_seg_state, reference_optimizer
    from mvtb_tpu.train.chunked import make_chunk_fn

    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(0), model, (1, 16, 16, 16, 4),
                             tx=reference_optimizer())
    sty = StylizeConfig(disk_r=12.5, disk_prob=1.0)  # flagship Gibbs
    chunk_fn = make_chunk_fn(sty)

    rng = np.random.RandomState(0)
    pool_i = jnp.asarray(rng.randn(2, 4, *spatial).astype(np.float32))
    pool_l = jnp.asarray((rng.rand(2, 3, *spatial) > 0.7).astype(np.float32))
    key = jax.random.key(1)

    def run(k_steps):
        idxs = jnp.asarray(rng.randint(0, 2, (k_steps, batch)))
        nonlocal state, key
        t0 = time.time()
        state, key, loss = chunk_fn(state, key, pool_i, pool_l, idxs)
        loss = float(loss)  # host fetch is the only real barrier here
        return time.time() - t0, loss

    run(2)  # compile
    t_lo, _ = run(2)
    t_hi, loss = run(12)
    ms = (t_hi - t_lo) / 10 * 1000
    return ms, batch / (ms / 1000), loss


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    out = {"batch": BATCH, "requested_spatial": SPATIAL, "attempts": []}
    spatial = SPATIAL
    while True:
        try:
            t0 = time.time()
            ms, vols, loss = probe(spatial, BATCH)
            out["attempts"].append({"spatial": spatial, "ok": True,
                                    "ms_per_step": round(ms, 1),
                                    "vol_per_s": round(vols, 2),
                                    "loss": loss,
                                    "wall_s": round(time.time() - t0, 1)})
            print(f"fullvol {spatial} b{BATCH}: {ms:.1f} ms/step "
                  f"({vols:.2f} vol/s) loss {loss:.4f}", flush=True)
            break
        except Exception as e:  # noqa: BLE001 - record OOM boundary
            msg = str(e)[:400]
            out["attempts"].append({"spatial": spatial, "ok": False,
                                    "error": msg})
            print(f"fullvol {spatial} FAILED: {msg}", flush=True)
            if "RESOURCE_EXHAUSTED" not in msg and "Out of memory" not in msg:
                break
            # halve D toward the crop size to find the boundary
            if spatial[-1] <= 64:
                break
            spatial = spatial[:-1] + (spatial[-1] // 2,)
    with open(os.path.join(OUTDIR, "fullvol.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.join(OUTDIR, "fullvol.json"))


if __name__ == "__main__":
    main()
