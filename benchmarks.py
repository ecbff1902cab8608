"""Measure all five BASELINE.json benchmark configs on the TPU.

Writes BENCHMARKS.md (and prints each result). ``bench.py`` remains the
single-line driver entry point (config #3, the north-star metric); this
script is the full record. All timings use the device-loop slope method
(see bench.py for why).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch


def loop_time(op, x, lo=2, hi=12):
    """ms per iteration of ``op(x, i)`` via fori_loop slope (single fetch).

    The carry reduces the FULL output (``jnp.sum``), not one element: XLA's
    algebraic simplifier pushes a slice back through dots/transposes, so a
    ``ravel(out)[0]`` carry lets entire trailing stages be dead-code
    eliminated (measured: the mask-only rfft config timed ~2x faster than
    real because its whole inverse transform chain was DCE'd). A sum keeps
    every output element live at the cost of one fused reduction pass.
    """

    def body(i, carry):
        v, acc = carry
        out = op(v, i + (acc * 0).astype(jnp.int32))
        return (v, jnp.sum(out).astype(jnp.float32))

    run = jax.jit(lambda v, k: jax.lax.fori_loop(0, k, body,
                                                 (v, jnp.float32(0)))[1],
                  static_argnums=1)
    float(run(x, lo))
    float(run(x, hi))

    def t(k):
        t0 = time.perf_counter()
        float(run(x, k))
        return time.perf_counter() - t0

    tl = min(t(lo), t(lo))
    th = min(t(hi), t(hi))
    return (th - tl) / (hi - lo) * 1e3


def config1():
    """2D single-channel Gibbs on a 240x240 T2 slice."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 240, 240), np.float32)
    # sampled radius keeps per-iteration work live (a fixed radius makes the
    # whole body loop-invariant and XLA hoists it out of the timing loop)
    cfg = StylizeConfig(n_dims=2, disk_r=(29.9, 30.1))
    ms = loop_time(lambda v, i: stylize_batch(
        v * (1 + 1e-7 * i), jax.random.fold_in(jax.random.key(0), i), cfg), x,
        lo=20, hi=520)  # 2D op is sub-ms; long loops for slope resolution
    return {"name": "2d_gibbs_240x240_slice", "ms_per_item": ms,
            "items_per_sec": 1e3 / ms, "unit": "slices/sec"}


def config2():
    """Full 2D corruption suite, one-channel slices, batch 32."""
    x = jnp.asarray(np.random.RandomState(0).randn(32, 1, 240, 240), np.float32)
    cfg = StylizeConfig(n_dims=2, gibbs_alpha=(0.2, 0.6), wrap_alpha=0.5,
                        spike=True, spike_range=(11.0, 12.0), sap_p=0.05)
    ms = loop_time(lambda v, i: stylize_batch(
        v, jax.random.fold_in(jax.random.key(0), i), cfg), x,
        lo=10, hi=110)
    return {"name": "2d_full_suite_batch32", "ms_per_batch": ms,
            "items_per_sec": 32 * 1e3 / ms, "unit": "slices/sec"}


def config3():
    """3D 4-channel 240x240x155 fused stylization (the bench.py headline)."""
    B = 4
    x = jnp.asarray(np.random.RandomState(0).randn(B, 4, 240, 240, 155),
                    np.float32)
    cfg = StylizeConfig(disk_r=(10.0, 25.0), plane_axes=(55.0, 55.0, 30.0),
                        plane_intensity=14.0, spike=True,
                        spike_range=(12.0, 13.0), wrap_alpha=0.5, sap_p=0.05)
    ms = loop_time(lambda v, i: stylize_batch(
        v, jax.random.fold_in(jax.random.key(0), i), cfg), x)
    return {"name": "3d_fused_240x240x155_4ch", "ms_per_batch": ms,
            "items_per_sec": B * 1e3 / ms, "unit": "volumes/sec"}


def config4():
    """3D UNet train step (fwd+bwd) with on-device augmentation, batch 4."""
    from mvtb_tpu.models import UNet
    from mvtb_tpu.train import create_seg_state
    from mvtb_tpu.train.losses import dice_loss

    B, SP = 4, (128, 128, 64)
    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    state = create_seg_state(jax.random.key(0), model, (1,) + SP + (4,))
    img = jnp.asarray(np.random.RandomState(0).randn(B, 4, *SP), np.float32)
    lbl = jnp.asarray((np.random.RandomState(1).rand(B, 3, *SP) > 0.8),
                      np.float32)
    cfg = StylizeConfig(disk_r=(10.0, 25.0), sap_p=0.05)
    params = state.params
    opt_state = state.opt_state
    tx = state.tx

    # state and batch pass through jit arguments (closure capture would
    # embed the 4.8M-param weights as HLO constants — huge remote uploads)
    def run(k, params, opt_state, img, lbl):
        import optax

        def body(i, carry):
            params, opt_state = carry
            key = jax.random.fold_in(jax.random.key(0), i)
            x = stylize_batch(img, key, cfg)

            def loss_fn(p):
                logits = model.apply({"params": p}, jnp.moveaxis(x, 1, -1))
                return dice_loss(logits, jnp.moveaxis(lbl, 1, -1))

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state)

        p, _ = jax.lax.fori_loop(0, k, body, (params, opt_state))
        return jax.tree.leaves(p)[0].ravel()[0].astype(jnp.float32)

    runj = jax.jit(run, static_argnums=0)
    float(runj(2, params, opt_state, img, lbl))
    float(runj(8, params, opt_state, img, lbl))

    def t(k):
        t0 = time.perf_counter()
        float(runj(k, params, opt_state, img, lbl))
        return time.perf_counter() - t0

    ms = (min(t(8), t(8)) - min(t(2), t(2))) / 6 * 1e3
    # Roofline context (static; the tunnel backend's compiled cost_analysis
    # under-counts convs ~30x and lowered analysis returns None, so the FLOP
    # count comes from CPU XLA on the identical program): the forward alone
    # is 50.9 GFLOP at batch 4 (jit(fwd).lower(...).compile().cost_analysis()
    # with JAX_PLATFORMS=cpu), so fwd+bwd+optimizer is ~0.15 TFLOP/step —
    # ~1% of v5e bf16 peak at ~79 ms. The MONAI-parity UNet strides 2 at its
    # FIRST conv (4.8M params, channels <= 256), so the step is dominated by
    # many small low-occupancy 3D convs plus the augmentation FFTs, not by
    # MXU-saturating GEMMs; the headroom is architectural.
    return {"name": "3d_unet_train_step_b4_128x128x64_bf16",
            "ms_per_step": ms, "items_per_sec": B * 1e3 / ms,
            "unit": "volumes/sec"}


def config5():
    """DCGAN generator+discriminator training iteration, batch 4."""
    from mvtb_tpu.models import Discriminator, Generator
    from mvtb_tpu.train.gan import create_gan_state, dcgan_step

    B, nz = 4, 100
    g = Generator(nz=nz, ngf=128, nc=1)
    d = Discriminator(nc=1, ndf=128)
    g_state = create_gan_state(jax.random.key(0), g, (B, 1, 1, nz))
    d_state = create_gan_state(jax.random.key(1), d, (B, 128, 128, 1))
    real = jnp.asarray(np.tanh(np.random.RandomState(0).randn(B, 128, 128, 1)),
                       np.float32)

    # states as jit args (closure capture embeds weights in the HLO and
    # trips the remote-compile request-size limit)
    def run(k, g_state, d_state, real):
        def body(i, carry):
            gs, ds = carry
            z = jax.random.normal(jax.random.fold_in(jax.random.key(2), i),
                                  (B, 1, 1, nz))
            gs, ds, _ = dcgan_step(gs, ds, real, z)
            return (gs, ds)
        gs, _ = jax.lax.fori_loop(0, k, body, (g_state, d_state))
        return jax.tree.leaves(gs.params)[0].ravel()[0].astype(jnp.float32)

    runj = jax.jit(run, static_argnums=0)
    float(runj(2, g_state, d_state, real))
    float(runj(8, g_state, d_state, real))

    def t(k):
        t0 = time.perf_counter()
        float(runj(k, g_state, d_state, real))
        return time.perf_counter() - t0

    ms = (min(t(8), t(8)) - min(t(2), t(2))) / 6 * 1e3
    return {"name": "dcgan_train_iter_b4_128x128", "ms_per_iter": ms,
            "unit": "iters/sec", "items_per_sec": 1e3 / ms}


def config6():
    """Magnitude-phase edit strategies on 4x240x240x155 k-space.

    (a) round-1 production tail: full-volume log/angle -> point write ->
        exp/cos/sin in XLA (the scatter forces the intermediates into HBM);
    (b) Pallas fused polar round trip (one VMEM pass) + the XLA point write;
    (c) round-2 production path: gather/scatter of the written points only.
    """
    from mvtb_tpu.ops.fourier import from_polar
    from mvtb_tpu.ops.pallas_kernels import polar_roundtrip_pallas

    x = jnp.asarray(np.random.RandomState(0).randn(4, 240, 240, 155),
                    np.float32)
    k0 = jnp.fft.fftn(x, axes=(-3, -2, -1))

    C = 4

    def _idx(i):
        # round-1-style advanced indexing: (arange(C), loc, loc, loc) — the
        # mixed slice+scalar form provokes a channel-minor layout copy (OOM)
        return (jnp.arange(C), jnp.full((C,), 3), jnp.full((C,), 5 + i * 0),
                jnp.full((C,), 7))

    def xla_tail(k, i):
        log_abs = jnp.log(jnp.abs(k) + 1e-10)
        phase = jnp.angle(k)
        log_abs = log_abs.at[_idx(i)].set(14.0)
        return from_polar(jnp.exp(log_abs), phase)

    def pallas_tail(k, i):
        ore, oim = polar_roundtrip_pallas(jnp.real(k), jnp.imag(k))
        out = (ore + 1j * oim).astype(k.dtype)
        idx = _idx(i)
        return out.at[idx].set(
            jnp.exp(jnp.asarray(14.0)) * jnp.exp(1j * jnp.angle(k[idx])))

    def scatter_tail(k, i):
        # the production formulation: iota-mask select (ops/fused.py)
        idx = _idx(i)
        pos = None
        for d in range(3):
            eq = (jax.lax.broadcasted_iota(jnp.int32, k.shape[1:], d)[None]
                  == idx[1 + d][:, None, None, None])
            pos = eq if pos is None else pos & eq
        old = jnp.sum(jnp.where(pos, k, 0), axis=(-3, -2, -1))
        new = from_polar(jnp.exp(jnp.full((C,), 14.0)), jnp.angle(old))
        return jnp.where(pos, new[:, None, None, None], k)

    out = {"name": "magnitude_edit_tail_4x240x240x155", "unit": "edits/sec"}
    for tag, fn in [("xla_full_chain_ms", xla_tail),
                    ("pallas_kernel_ms", pallas_tail),
                    ("scatter_only_ms", scatter_tail)]:
        # perturb the input per iteration: with a loop-invariant k the whole
        # polar decomposition hoists out of the timing loop and the slope
        # collapses to ~0
        out[tag] = loop_time(
            lambda v, i, f=fn: f(v * (1 + 1e-12 * i.astype(jnp.float32)), i),
            k0)
    out["ms_per_item"] = out["scatter_only_ms"]  # production path
    out["items_per_sec"] = 1e3 / max(out["scatter_only_ms"], 1e-9)
    return out


def config7():
    """Mask-only stylization: rfft half-spectrum path vs forced-complex."""
    from mvtb_tpu.ops import fused as fused_mod

    x = jnp.asarray(np.random.RandomState(0).randn(4, 4, 240, 240, 154),
                    np.float32)  # even last dim -> rfft-eligible
    cfg = StylizeConfig(disk_r=(12.4, 12.6), wrap_alpha=0.5)

    # stylize_batch is jitted at the API boundary, so monkeypatching
    # _rfft_eligible after the first trace would silently re-time the cached
    # rfft program. Build a FRESH unjitted vmap per leg instead; the i-dep
    # key threads the loop-carried dependency for slope timing.
    def make_run():
        def run(v, i):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.key(0), i), v.shape[0])
            return jax.vmap(fused_mod.stylize_kspace,
                            in_axes=(0, 0, None))(v, keys, cfg)
        return run

    ms_rfft = loop_time(make_run(), x)
    orig = fused_mod._rfft_eligible
    try:
        fused_mod._rfft_eligible = lambda *_: False
        ms_full = loop_time(make_run(), x)
    finally:
        fused_mod._rfft_eligible = orig
    return {"name": "mask_only_240x240x154_4ch_b4",
            "rfft_ms_per_batch": ms_rfft, "complex_ms_per_batch": ms_full,
            "speedup": ms_full / ms_rfft, "ms_per_batch": ms_rfft,
            "items_per_sec": 4 * 1e3 / ms_rfft, "unit": "volumes/sec"}


def config8():
    """Fourier backends on the headline stack: XLA FFT vs matmul-DFT on the
    MXU (f32-accurate HIGHEST passes) vs single-pass bf16 matmul-DFT.

    Same config/shape as config 3, rfft-eligible. Also records the bf16
    backend's relative error against the XLA path (same key -> same draws).
    """
    B = 4
    x = jnp.asarray(np.random.RandomState(0).randn(B, 4, 240, 240, 155),
                    np.float32)
    base = dict(disk_r=(10.0, 25.0), plane_axes=(55.0, 55.0, 30.0),
                plane_intensity=14.0, spike=True, spike_range=(12.0, 13.0),
                wrap_alpha=0.5, sap_p=0.05)
    out = {"name": "fourier_backends_240x240x155_4ch_b4",
           "unit": "volumes/sec"}
    for tag, backend in [("xla_ms", "xla"), ("dft_ms", "dft"),
                         ("dft_fast_ms", "dft_fast"),
                         ("hybrid_ms", "hybrid"),
                         ("plane_ms", "plane"),
                         ("plane_fast_ms", "plane_fast")]:
        cfg = StylizeConfig(**base, fft_backend=backend)
        out[tag] = loop_time(lambda v, i, c=cfg: stylize_batch(
            v, jax.random.fold_in(jax.random.key(0), i), c), x)
    key = jax.random.key(3)
    ref = stylize_batch(x, key, StylizeConfig(**base, fft_backend="xla"))
    for tag, backend in [("dft_fast_rel_err", "dft_fast"),
                         ("hybrid_rel_err", "hybrid"),
                         ("plane_rel_err", "plane"),
                         ("plane_fast_rel_err", "plane_fast")]:
        got = stylize_batch(x, key, StylizeConfig(**base, fft_backend=backend))
        out[tag] = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    best = min(out["xla_ms"], out["dft_ms"], out["dft_fast_ms"],
               out["hybrid_ms"], out["plane_ms"], out["plane_fast_ms"])
    out["ms_per_batch"] = best
    out["items_per_sec"] = B * 1e3 / best
    return out


def config9():
    """Serving-side inference: UNet forward (sigmoid probs), batch 1 and 8.

    The latency/throughput a `mvtb_tpu.serve.ServingBundle` consumer sees
    (the exported program is the same jitted forward; BENCHMARKS narrative).
    """
    from mvtb_tpu.models import UNet

    SP = (128, 128, 64)
    model = UNet(out_channels=3, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1,) + SP + (4,), jnp.float32))

    # params travel as jit args (closure capture embeds 4.8M weights as HLO
    # constants — remote-compile size trap); sum carry as in loop_time
    def run(k, params, x):
        def body(i, carry):
            x, acc = carry
            probs = jax.nn.sigmoid(
                model.apply(params, x * (1 + 1e-7 * i + acc * 0)))
            return (x, jnp.sum(probs).astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]

    runj = jax.jit(run, static_argnums=0)
    out = {"name": "unet_inference_128x128x64_bf16", "unit": "volumes/sec"}
    for B, tag in ((1, "b1"), (8, "b8")):
        x = jnp.asarray(np.random.RandomState(0).randn(B, *SP, 4), np.float32)
        lo, hi = 4, 24
        float(runj(lo, params, x))
        float(runj(hi, params, x))

        def t(k):
            t0 = time.perf_counter()
            float(runj(k, params, x))
            return time.perf_counter() - t0

        ms = (min(t(hi), t(hi)) - min(t(lo), t(lo))) / (hi - lo) * 1e3
        out[f"ms_{tag}"] = ms
        out[f"vols_per_sec_{tag}"] = B * 1e3 / ms
    # table row: one consistent (time, throughput) pair — the batch-8 leg;
    # the narrative bullet reports the batch-1 latency separately
    out["ms_per_batch"] = out["ms_b8"]
    out["items_per_sec"] = out["vols_per_sec_b8"]
    return out


def config10():
    """Sliding-window inference at TCGA scale: roi-tiled UNet over a full
    240x240x155 volume (the reference's ``TCGA_data_augmentation.ipynb``
    pattern, ``sliding_window_inference(roi_size=(128,128,64))``), constant
    and gaussian blending — the program ``ModelEvaluation(roi_size=...)``
    executes per batch. 27 tiles/volume at overlap 0.25.
    """
    from mvtb_tpu.eval.sliding_window import sliding_window_inference
    from mvtb_tpu.models import UNet

    ROI = (128, 128, 64)
    model = UNet(out_channels=1, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1,) + ROI + (1,), jnp.float32))["params"]

    def apply_fn(vars_, tile_cl):
        return model.apply(vars_, tile_cl)

    out = {"name": "sliding_window_240x240x155_roi128x128x64",
           "unit": "volumes/sec"}

    def run(k, params, x, mode, tile_batch):
        def body(i, carry):
            x, acc = carry
            logits = sliding_window_inference(
                x * (1 + 1e-7 * i + acc * 0), ROI, apply_fn, params,
                overlap=0.25, mode=mode, tile_batch=tile_batch)
            return (x, jnp.sum(logits).astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]

    runj = jax.jit(run, static_argnums=(0, 3, 4))
    for B, mode, tb, tag in ((1, "constant", 8, "b1_const"),
                             (1, "gaussian", 8, "b1_gauss"),
                             (2, "constant", 8, "b2_const"),
                             (1, "constant", 1, "b1_const_pertile")):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 240, 240, 155),
                        np.float32)
        lo, hi = 2, 6
        float(runj(lo, params, x, mode, tb))
        float(runj(hi, params, x, mode, tb))

        def t(k):
            t0 = time.perf_counter()
            float(runj(k, params, x, mode, tb))
            return time.perf_counter() - t0

        ms = (min(t(hi), t(hi)) - min(t(lo), t(lo))) / (hi - lo) * 1e3
        out[f"ms_{tag}"] = ms
        out[f"vols_per_sec_{tag}"] = B * 1e3 / ms
    out["ms_per_item"] = out["ms_b1_const"]
    out["items_per_sec"] = out["vols_per_sec_b1_const"]
    return out


def main():
    results = []
    for fn in (config1, config2, config3, config4, config5, config6, config7,
               config8, config9, config10):
        r = fn()
        print(json.dumps(r), flush=True)
        results.append(r)

    lines = [
        "# BENCHMARKS — TPU v5e (1 chip), measured",
        "",
        "The five BASELINE.json configs plus added measurements (point-edit",
        "tail, rfft path, Fourier backends, inference), device-loop slope",
        "timing (see bench.py). Regenerate with `python benchmarks.py`.",
        "",
        "| # | Config | Time | Throughput |",
        "|---|---|---|---|",
    ]
    keys = ["ms_per_item", "ms_per_batch", "ms_per_step", "ms_per_iter"]
    for i, r in enumerate(results, 1):
        tkey = next(k for k in keys if k in r)
        lines.append(f"| {i} | {r['name']} | {r[tkey]:.2f} ms "
                     f"({tkey.replace('_', ' ')}) | "
                     f"{r['items_per_sec']:.1f} {r['unit']} |")
    tail = next(r for r in results if r["name"].startswith("magnitude_edit"))
    rfft = next(r for r in results if r["name"].startswith("mask_only"))
    fb = next(r for r in results if r["name"].startswith("fourier_backends"))
    lines += [
        "",
        "## Measured decisions",
        "",
        f"- **k-point magnitude edits** (config 6): the production iota-mask"
        f" select runs {tail['scatter_only_ms']:.2f} ms standalone vs"
        f" {tail['xla_full_chain_ms']:.2f} ms for the full XLA polar chain"
        f" and {tail['pallas_kernel_ms']:.2f} ms for the fused Pallas polar"
        " kernel (pad/copy + unfused neighbors lose to XLA's single fused"
        " pass, as with the round-1 salt&pepper kernel). In the fused"
        " stylization program the mask-select wins end-to-end — the round-1"
        " chain forced log-magnitude/phase into HBM around its scatter"
        " (headline config 3: 64 -> 85 volumes/sec after that change,"
        " then -> "
        f"{next(r for r in results if r['name'].startswith('3d_fused'))['items_per_sec']:.0f}"
        " volumes/sec once point writes joined the rfft path below). The"
        " Pallas kernel stays as the measured template"
        " (ops/pallas_kernels.py).",
        f"- **rfft half-spectrum path** (config 7): symmetric-weight configs"
        f" run {rfft['speedup']:.2f}x faster than the forced-complex path"
        f" ({rfft['rfft_ms_per_batch']:.1f} vs"
        f" {rfft['complex_ms_per_batch']:.1f} ms/batch). Spike/plane point"
        " writes also ride the half spectrum via the Hermitian-projected"
        " write H[c] += (w - k[s])*scale (ops/fused.py:point_update) —"
        " that is what lifted headline config 3 from 85 to the value in"
        " the table. EVERY k-space stage now rides the half spectrum: even-size Gibbs masks apply the explicitly symmetrized weight (w[i]+w[-i])/2 and random zero-fill draws pair-iid Bernoulli keeps — both exactly what the .real projection realifies, so the complex leg below is a forced-path measurement.",
        f"- **Fourier backends** (config 8, the headline stack): XLA FFT"
        f" {fb['xla_ms']:.1f} ms/batch vs all-axis matmul-DFT on the MXU"
        f" {fb['dft_ms']:.1f} ms (f32-accurate) vs single-pass bf16"
        f" matmul-DFT {fb['dft_fast_ms']:.1f} ms at"
        f" {fb['dft_fast_rel_err']:.1e} relative error vs the per-axis"
        f" **hybrid** {fb['hybrid_ms']:.1f} ms at {fb['hybrid_rel_err']:.1e}"
        " (XLA FFT on 2/3/5-smooth axes — 240 = 2^4*3*5 — transposed"
        " innermost, matmul-DFT on the Bluestein-hostile 155 = 5*31 axis)."
        " Complex-input axes use Gauss's 3-matmul contraction (25% fewer"
        " MACs than the naive 4 — ops/dft.py:_gauss_dft_matrices_np); that"
        " is what put the f32-accurate all-matmul backend ahead of the"
        " hybrid and made it the accelerator 'auto' default"
        " (StylizeConfig.fft_backend) — it also won one-off dft-vs-xla"
        " checks on fully 2/3/5-smooth shapes (1.57 vs 2.30 ms at"
        " 128x128x64 b4; 0.14 vs 0.29 ms on the 2D 240x240 b32 suite;"
        " 2026-08-19, not regenerated by this script). The half-spectrum"
        " rDFT is 0.44x the MACs of the full complex transform"
        " (ops/dft.py:rdft_nd).",
        "- **Matmul precision sweep** (one-off, 2026-08-19; full-spectrum"
        " rdft roundtrip at the headline shape): HIGHEST 23.6 ms at 2.5e-7,"
        " HIGH (3-pass bf16) 22.4 ms at 6.3e-5, DEFAULT (1-pass bf16)"
        " 20.3 ms at 8.3e-3. An 8x matmul-throughput change moves the wall"
        " clock only ~14% — the transform chain is glue/HBM-bound after the"
        " Gauss trick, so HIGH was rejected (5% for 250x the error) and"
        " further MAC-count tricks (radix-2 matrix splitting) were not"
        " pursued.",
        "- **Pallas per-axis DFT kernels** (one-off, 2026-08-19;"
        " ops/pallas_dft.py, `fft_backend=\"dft_pallas\"`): each axis step"
        " fuses the full Gauss 3-matmul contraction into one VMEM pass"
        " (2 reads + 2 writes vs XLA's ~6+3). XLA still wins: c2c axis step"
        " at the 4ch half grid 1.04 ms (XLA HIGHEST) vs 1.75 ms (kernel,"
        " single-pass bf16) — a pure in->out Pallas COPY already costs"
        " 1.31 ms. Probe result: the Pallas DMA pipeline on this runtime"
        " moves ~400 GB/s regardless of block size, `dimension_semantics`,"
        " or tile contiguity, while XLA's fusions run at ~860 GB/s"
        " (read-only roofline measured 861 GB/s) — the same 2.6x deficit"
        " the round-1 salt&pepper kernel hit. Conclusion recorded: per-axis"
        " kernels cannot win here; only a kernel cutting HBM traffic by"
        " MORE than the bandwidth deficit can (see the fused plane kernel"
        " below). Mosaic side-findings: native-f32 dots lower ~2.2x slower"
        " than XLA's f32 (use in-kernel bf16x3 for the HIGH tier), and"
        " bf16 operands reject a precision override.",
        f"- **Fused plane kernel** (ops/fused_plane.py,"
        " `fft_backend=\"plane\"/\"plane_fast\"`): the first Pallas kernel"
        " here that beats XLA. It keeps the rfft half axis on H so each"
        " (channel, half-H) grid tile is a contiguous (W, D) plane, and"
        " runs forward W/D DFTs -> multiplicative weights (gibbs/disk/wrap,"
        " iota-built in registers) -> spike/plane Hermitian point writes ->"
        " inverse D/W DFTs in ONE VMEM pass — one HBM read + one write of"
        " the spectrum where the XLA chain pays ~4 axis round trips plus"
        " the weight/write sweeps. Headline config-3 stack on-chip:"
        f" **{fb['plane_fast_ms']:.2f} ms/batch-4"
        f" ({4e3 / fb['plane_fast_ms']:.1f} vol/s)** for `plane_fast`"
        f" (single-pass bf16 dots, {fb['plane_fast_rel_err']:.1e} rel —"
        " same error tier as the bf16 all-matmul DFT"
        f" at {fb['dft_fast_ms']:.1f} ms) vs {fb['dft_ms']:.2f} ms for the"
        f" f32-accurate `dft` default and {fb['plane_ms']:.2f} ms for"
        " `plane` at bf16x3. Round 3 pre-lowers the 12 resident DFT"
        " matrices for the precision tier OUTSIDE the grid loop (bf16 for"
        " 1x, hi/lo split pairs for 3x); measured outcome: NO wall-clock"
        " change vs round 2's in-kernel re-splits — the accurate tier is"
        " MXU-pass-bound, not VPU-bound. Recorded dead-end for the"
        " sub-21.7ms accurate-kernel goal: at bf16x3 the kernel's 3x"
        " per-tile dots (484 sequential (W,W)@(W,D) grid steps) already"
        " exceed the XLA chain's total — XLA runs the same split math as"
        " volume-wide batched GEMMs with better MXU pipelining, so the"
        " kernel's ~4-round-trip HBM saving only pays at the 1x tier."
        " Accuracy of the tier vs `dft`: 3.1e-06 at 96x96x48,"
        f" {fb['plane_rel_err']:.1e} at the headline shape."
        " The accuracy-first 'auto' default stays `dft`;"
        " `plane_fast` is the opt-in fast tier. Batched calls fold the"
        " batch into the channel grid axis via a custom_vmap rule (Mosaic"
        " rejects vmap-blocked SMEM scalar specs). Parity vs the dft path:"
        f" {fb['plane_rel_err']:.1e} (`plane`) on the full stacked config,"
        " draws bit-identical by key-stream construction"
        " (tests/test_fused_plane.py). Side find: the on-chip parity drive"
        " exposed a latent signed-zero bug in the production dft path —"
        " XLA TPU folds the documented `+ czero` canonicalization away"
        " (`x+0 -> x` under excess precision), flipping written phase to"
        " pi at weight-zeroed points; fixed with a fold-proof"
        " `where(z == 0, 0, z)` select (ops/fused.py:canon_zero).",
        "- **Buffer donation**: all train steps donate their state"
        " (in-place optimizer updates); config 4 reflects the donating step.",
    ]
    unet = next(r for r in results if r["name"].startswith("3d_unet"))
    lines += [
        f"- **Train step, profiled and optimized** (config 4; full record:"
        " reports/train_step_profile/RESULTS.md): round-3 ablation"
        " attribution at batch 4 — augmentation 1.5 ms (2%), forward ~23,"
        " backward ~54, optimizer ~1; InstanceNorm+PReLU are 37% of fwd+bwd"
        " (flax's f32 stat upcasts + PReLU's f32 slope promotion insert"
        " full-tensor converts at every block boundary). Per-level conv"
        " microbenchmarks put the wide levels at their LANE ceiling (C=16"
        " output channels use 16/128 MXU lanes; the measured 7.9 TF/s is"
        " ~63% of that 12.5% cap) — the topology, not the lowering, sets"
        " the roofline. The measured win shipped in the model: stride-1 k3"
        " 3D convs lower as three (B*D)-slab 2D convs + two shifted adds"
        " (models/unet3d.py:Conv, exact reformulation, param-compatible)"
        " — 1.88x on fwd+bwd (74.8 -> 39.8 ms) in the profile harness."
        f" Config 4 with the slab lowering: {unet['ms_per_step']:.1f}"
        f" ms/step ({unet['items_per_sec']:.1f} vol/s) vs 78.5 in round 2."
        " Batch scaling is strongly sublinear (B=16 gives 2.1x the vol/s of"
        " B=4); pixel-shuffle upsampling and remat both LOST (RESULTS.md).",
    ]
    sw = next((r for r in results if r["name"].startswith("sliding_window")),
              None)
    if sw is not None:
        lines += [
            f"- **Sliding-window inference at TCGA scale** (config 10): a"
            f" full 240x240x155 volume through roi (128,128,64) tiles (27"
            f" tiles, overlap 0.25) runs {sw['ms_b1_const']:.1f} ms/volume"
            f" constant-blended ({sw['vols_per_sec_b1_const']:.1f} vol/s),"
            f" {sw['ms_b1_gauss']:.1f} ms gaussian-blended, and"
            f" {sw['ms_b2_const']:.1f} ms/batch-2"
            f" ({sw['vols_per_sec_b2_const']:.1f} vol/s) — the"
            " `ModelEvaluation(roi_size=...)` program; tile grid is static,"
            " the whole sweep is ONE XLA program (eval/sliding_window.py)."
            " Round 3 flattens tiles into the batch axis and runs"
            " `tile_batch=8` samples per forward (lax.scan over chunks,"
            " identical numerics — per-sample ops only; blend norm map"
            " precomputed on the host):"
            f" {sw['ms_b1_const_pertile']:.1f} ms with the per-tile"
            " schedule (tile_batch=1, 27 underutilized batch-1 forwards) ->"
            f" {sw['ms_b1_const']:.1f} ms batched"
            f" ({sw['ms_b1_const_pertile'] / sw['ms_b1_const']:.2f}x;"
            " 1.60x vs round 2's 169.2 ms, which also paid per-update"
            " device norm accumulation). Equality across tile_batch values"
            " is tested (tests/test_eval_extras.py).",
        ]
    inf = next((r for r in results if r["name"].startswith("unet_inference")),
               None)
    if inf is not None:
        lines += [
            f"- **Serving inference** (config 9): the UNet forward"
            f" (sigmoid probs) runs at {inf['ms_b1']:.1f} ms/volume batch-1"
            f" latency and {inf['vols_per_sec_b8']:.0f} volumes/sec at"
            f" batch 8 ({inf['ms_b8']:.1f} ms/batch) — the program a"
            " `mvtb_tpu.serve.ServingBundle` consumer executes.",
        ]
    lines += [
        "- **Harness integrity**: the timing loop carries jnp.sum(out), not"
        " out[0] — XLA pushes slices back through dots/transposes, and a"
        " one-element carry let entire inverse-transform chains be DCE'd"
        " (the mask-only config once timed ~2x faster than real; stacks"
        " ending in salt&pepper were immune because its min/max reductions"
        " keep every element live). See loop_time's docstring.",
        "- **Native NIfTI decode** (host): the C++ one-pass decoder"
        " (gzip inflate fused with int16->float32 conversion,"
        " `mvtb_tpu/native/nifti.cpp`) reads a BraTS-shaped 240x240x155x4"
        " int16 `.nii.gz` (16.4 MB compressed) in 234 ms vs 354 ms for the"
        " pure-Python path + float32 cast (1.5x), with no intermediate"
        " decompressed byte buffer. Bit-identical output"
        " (tests/test_native_nifti.py).",
        "",
    ]
    # preserve hand-measured sections (one-off runs not reproduced by this
    # script, e.g. the round-4 reference-length training records) across
    # regenerations: everything from the marker onward is carried over.
    marker = "## Round-4 measured decisions"
    try:
        with open("BENCHMARKS.md") as f:
            old = f.read()
        if marker in old:
            lines.append(old[old.index(marker):])
    except FileNotFoundError:
        pass
    with open("BENCHMARKS.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCHMARKS.md")


if __name__ == "__main__":
    main()
