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
    """(ms/step, vol/s, loss, chunked_ms) for the full stylize+train step.

    Measures BOTH dispatch paths. Direct per-step dispatch is the honest
    per-step number at this size (one step is hundreds of ms of device
    work, so dispatch overhead is negligible); the chunked fori_loop
    program measures IDENTICAL (207.5 vs 205 ms/step at 240x240x160) ONCE
    BOTH loop lengths are compiled before timing — bench.py's discipline.
    Harness-integrity lesson re-learned here: a loop-slope window that
    compiles its long program inside the timed region reported the chunk
    as 2.9x slower (594 ms) and once as 5,931 ms (the 12-step program's
    ~59 s compile / 10).
    """
    from mvtb_tpu.models import UNet
    from mvtb_tpu.ops.fused import StylizeConfig
    from mvtb_tpu.train import create_seg_state, reference_optimizer
    from mvtb_tpu.train.chunked import make_chunk_fn
    from mvtb_tpu.train.seg import seg_train_step

    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(0), model, (1, 16, 16, 16, 4),
                             tx=reference_optimizer())
    sty = StylizeConfig(disk_r=12.5, disk_prob=1.0)  # flagship Gibbs
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(batch, 4, *spatial).astype(np.float32))
    lbl = jnp.asarray((rng.rand(batch, 3, *spatial) > 0.7).astype(np.float32))

    def run(k_steps):
        nonlocal state
        t0 = time.time()
        for i in range(k_steps):
            state, loss = seg_train_step(state, img, lbl, jax.random.key(i),
                                         sty)
        loss = float(loss)  # host fetch is the only real barrier here
        return time.time() - t0, loss

    run(2)  # compile
    t_lo, _ = run(2)
    t_hi, loss = run(12)
    ms = (t_hi - t_lo) / 10 * 1000

    # chunked comparison point (one fori_loop dispatch per K steps)
    chunk_fn = make_chunk_fn(sty)
    cstate = create_seg_state(jax.random.key(0), model, (1, 16, 16, 16, 4),
                              tx=reference_optimizer())
    pool_i = jnp.concatenate([img, img])
    pool_l = jnp.concatenate([lbl, lbl])
    ckey = jax.random.key(1)

    def crun(k_steps):
        nonlocal cstate, ckey
        idxs = jnp.asarray(rng.randint(0, 2, (k_steps, batch)))
        t0 = time.time()
        cstate, ckey, l = chunk_fn(cstate, ckey, pool_i, pool_l, idxs)
        float(l)
        return time.time() - t0

    crun(2)   # compile the 2-step program
    crun(12)  # compile the 12-step program BEFORE timing
    ct_lo = crun(2)
    ct_hi = crun(12)
    return ms, batch / (ms / 1000), loss, (ct_hi - ct_lo) / 10 * 1000


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    out = {"batch": BATCH, "requested_spatial": SPATIAL, "attempts": []}
    spatial = SPATIAL
    while True:
        try:
            t0 = time.time()
            ms, vols, loss, chunked_ms = probe(spatial, BATCH)
            out["attempts"].append({"spatial": spatial, "ok": True,
                                    "ms_per_step": round(ms, 1),
                                    "vol_per_s": round(vols, 2),
                                    "chunked_ms_per_step":
                                        round(chunked_ms, 1),
                                    "loss": loss,
                                    "wall_s": round(time.time() - t0, 1)})
            print(f"fullvol {spatial} b{BATCH}: {ms:.1f} ms/step direct "
                  f"({vols:.2f} vol/s), chunked {chunked_ms:.1f} ms/step, "
                  f"loss {loss:.4f}", flush=True)
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
