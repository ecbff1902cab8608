"""Headline benchmark: fused 3D k-space augmentation throughput.

Measures BASELINE.json config #3 — the full textural-stylization stack
(Gibbs disk mask + plane-wave spike + per-channel k-space spikes +
wraparound + salt&pepper) applied to 4-channel 240x240x155 BraTS-shaped
volumes:

* TPU path: ``mvtb_tpu.ops.fused.stylize_batch`` — one jitted program, one
  FFT->elementwise->iFFT round trip per volume, masks generated on the fly.
* CPU reference: the reference's own architecture — sequential per-corruption
  FFT round trips in torch on the host (as its MONAI transforms run in
  dataloader workers; see SURVEY.md section 3.2) — timed on this machine.

Prints ONE JSON line:
``{"metric": ..., "value": V, "unit": "volumes/sec/chip", "vs_baseline": R}``
where R = TPU volumes/sec divided by CPU-reference volumes/sec (target >= 5).
"""

from __future__ import annotations

import json
import time

import numpy as np

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

SPATIAL = (240, 240, 155)
CHANNELS = 4
BATCH = 4
TPU_ITERS = 8
# Three timed CPU iterations, best-of (the denominator is conservative: the
# fastest CPU pass yields the LOWEST vs_baseline ratio). The 1-core host also
# runs the TPU client, so per-iteration noise is real — measured spread was
# <10% across iterations, far below the reported ~1500x headroom.
CPU_ITERS = 3


def _tpu_throughput() -> float:
    """Device-loop slope timing: the op iterates inside one jitted
    ``fori_loop`` with a loop-carried dependency, so one dispatch + one host
    fetch bounds K executions. The K=12 minus K=2 slope cancels dispatch/RTT
    overhead — required on this tunneled TPU, where ``block_until_ready``
    does not actually block."""
    import jax
    import jax.numpy as jnp

    from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch

    cfg = StylizeConfig(
        disk_r=(10.0, 25.0),
        plane_axes=(55.0, 55.0, 30.0), plane_intensity=14.0,
        spike=True, spike_range=(12.0, 13.0),
        wrap_alpha=0.5,
        sap_p=0.05,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, CHANNELS, *SPATIAL).astype(np.float32))

    def body(i, carry):
        v, acc = carry
        key = jax.random.fold_in(jax.random.key(0), i + (acc * 0).astype(jnp.int32))
        out = stylize_batch(v, key, cfg)
        # sum-reduce so no trailing stage can be dead-code eliminated
        # (XLA pushes slices through dots; see benchmarks.loop_time);
        # cast so a non-f32 output dtype can't break the carry signature
        return (v, jnp.sum(out).astype(jnp.float32))

    run = jax.jit(
        lambda v, k: jax.lax.fori_loop(0, k, body, (v, jnp.float32(0)))[1],
        static_argnums=1)
    float(run(x, 2))
    float(run(x, 12))  # compile both loop lengths

    def timed(k):
        t0 = time.perf_counter()
        float(run(x, k))
        return time.perf_counter() - t0

    t2 = min(timed(2), timed(2))
    t12 = min(timed(12), timed(12))
    per_iter = (t12 - t2) / 10
    return BATCH / per_iter


def _cpu_reference_throughput() -> float:
    """Reference-architecture stack on CPU torch: 4 separate FFT round trips
    (disk filter, plane wave, spikes, wrap) + image-domain salt&pepper."""
    import torch

    def shift_fft(t, nd=3):
        dims = tuple(range(-nd, 0))
        return torch.fft.fftshift(torch.fft.fftn(t, dim=dims), dim=dims)

    def inv(k, nd=3):
        dims = tuple(range(-nd, 0))
        return torch.fft.ifftn(torch.fft.ifftshift(k, dim=dims), dim=dims).real

    from math import floor

    grids = np.ogrid[tuple(slice(0, n) for n in SPATIAL)]
    center = [floor(n / 2) for n in SPATIAL]
    dist_sq = sum((g - c) ** 2 for g, c in zip(grids, center))

    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.randn(CHANNELS, *SPATIAL).astype(np.float32))

    times = []
    for _ in range(CPU_ITERS):
        t0 = time.perf_counter()
        # 1) Gibbs disk filter
        k = shift_fft(x)
        mask = torch.from_numpy((dist_sq < 17.0 ** 2).astype(np.float32))
        y = inv(k * mask)
        # 2) plane wave (log-magnitude point write)
        k = shift_fft(y)
        la, ph = k.abs().log(), k.angle()
        la[:, 120, 120, 100] = 14.0
        y = inv(la.exp() * torch.exp(1j * ph))
        # 3) per-channel spikes
        k = shift_fft(y)
        la, ph = torch.log(k.abs() + 1e-10), k.angle()
        for c in range(CHANNELS):
            la[c, 60, 64, 32] = 12.5
        y = inv(torch.exp(la) * torch.exp(1j * ph))
        # 4) wraparound
        k = shift_fft(y)
        k[:, 1::2, :, :] *= 0.5
        k[:, :, 1::2, :] *= 0.5
        k[:, :, :, 1::2] *= 0.5
        y = inv(k)
        # 5) salt & pepper
        u = torch.rand(y.shape)
        hi, lo = y.max() / 2, y.min() / 2
        y[u <= 0.025] = lo
        y[(u > 0.025) & (u <= 0.05)] = hi
        times.append(time.perf_counter() - t0)
    # fastest CPU iteration -> conservative (lowest) vs_baseline ratio
    return 1.0 / min(times)


def main() -> None:
    tpu = _tpu_throughput()
    cpu = _cpu_reference_throughput()
    print(json.dumps({
        "metric": "fused_3d_kspace_augmentation_240x240x155_4ch",
        "value": round(tpu, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
