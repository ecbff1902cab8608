"""Fused stylization: the shift-free raw-coordinate implementation must match
the per-op (fftshift-based) reference path stage by stage."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu import ops
from mvtb_tpu.ops.fused import (StylizeConfig, stage_keys, stylize_batch,
                                stylize_kspace)

SHAPE = (2, 24, 20, 15)


def _x(seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*SHAPE).astype(np.float32))


def assert_close(a, b, tol=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a, b, atol=tol * scale, rtol=tol)


def test_disk_only_matches_op():
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(disk_r=6.0))
    want = ops.fourier_disk_filter(x, 6.0, 3, False)
    assert_close(got, want)


def test_disk_inside_off_matches_op():
    x = _x()
    cfg = StylizeConfig(disk_r=6.0, disk_inside_off=True)
    got = stylize_kspace(x, jax.random.key(0), cfg)
    want = ops.fourier_disk_filter(x, 6.0, 3, True)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.7])
def test_gibbs_only_matches_op(alpha):
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(gibbs_alpha=alpha))
    want = ops.gibbs_noise(x, alpha)
    assert_close(got, want)


@pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 1.0])
def test_wrap_only_matches_op(alpha):
    x = _x()
    got = stylize_kspace(x, jax.random.key(0), StylizeConfig(wrap_alpha=alpha))
    want = ops.wrap_artifact(x, alpha)
    assert_close(got, want)


def test_wrap_even_and_odd_axes_2d():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 13).astype(np.float32))
    cfg = StylizeConfig(n_dims=2, wrap_alpha=0.25)
    got = stylize_kspace(x, jax.random.key(0), cfg)
    want = ops.wrap_artifact(x, 0.25, 2)
    assert_close(got, want)


def test_spike_shared_loc_matches_op():
    """Non-channel-wise spike: recover the sampled shifted loc and compare
    against the explicit kspace_spike op."""
    x = _x()
    cfg = StylizeConfig(spike=True, spike_range=(12.0, 12.0),
                        spike_channel_wise=False)
    got = stylize_kspace(x, jax.random.key(3), cfg)

    # replicate the key stream to find the sampled shifted location
    keys = jax.random.split(jax.random.key(3), 16)
    loc_keys = jax.random.split(keys[0], 3)
    loc = tuple(int(jax.random.randint(loc_keys[d], (), 0, SHAPE[1:][d]))
                for d in range(3))
    want = ops.kspace_spike(x, [loc], [12.0])
    assert_close(got, want)


def test_plane_wave_matches_op():
    x = _x()
    cfg = StylizeConfig(plane_axes=(6.0, 5.0, 4.0), plane_intensity=11.0)
    got = stylize_kspace(x, jax.random.key(5), cfg)

    keys = jax.random.split(jax.random.key(5), 16)
    shell = ops.ellipsoid_shell_mask(SHAPE[1:], 6.0, 5.0, 4.0)
    logits = jnp.where(jnp.asarray(shell.ravel()), 0.0, -jnp.inf)
    flat = jax.random.categorical(keys[0], logits)
    loc = tuple(int(v) for v in np.unravel_index(int(flat), SHAPE[1:]))
    want = ops.plane_wave(x, loc, 11.0)
    assert_close(got, want)


def test_rfft_fast_path_matches_ops():
    """Mask-only configs take the rfftn half-spectrum path; outputs must
    match the per-op (full complex) implementations on even and odd sizes."""
    from mvtb_tpu.ops.fused import _rfft_eligible

    for shape in [(2, 16, 16, 8), (1, 9, 9, 7), (2, 24, 20, 15)]:
        x = jnp.asarray(np.random.RandomState(1).randn(*shape).astype(np.float32))
        cfg = StylizeConfig(disk_r=4.0, wrap_alpha=0.25)
        assert _rfft_eligible(cfg, shape[1:])
        got = stylize_kspace(x, jax.random.key(0), cfg)
        want = ops.wrap_artifact(ops.fourier_disk_filter(x, 4.0, 3, False), 0.25)
        assert_close(got, want)

    # gibbs rides the half spectrum for ALL sizes: odd sizes directly
    # (mod-n-symmetric mask), even sizes via the explicitly symmetrized
    # weight (w[i]+w[-i])/2 — the projection the per-op .real applies
    for shape in [(1, 9, 9, 7), (2, 24, 20, 15), (1, 16, 16, 8)]:
        xg = jnp.asarray(np.random.RandomState(2).randn(*shape).astype(np.float32))
        for alpha in (0.0, 0.5):
            cfg_g = StylizeConfig(gibbs_alpha=alpha)
            assert _rfft_eligible(cfg_g, shape[1:])
            assert_close(stylize_kspace(xg, jax.random.key(0), cfg_g),
                         ops.gibbs_noise(xg, alpha))

    # point writes ride the half spectrum (Hermitian-projected write), and
    # so does random zero-fill (pair-iid Bernoulli keeps, realified weight
    # (b_i + b_-i)/2): nothing forces the complex path anymore
    assert _rfft_eligible(StylizeConfig(disk_r=4.0, spike=True), (8, 8, 8))
    assert _rfft_eligible(
        StylizeConfig(disk_r=4.0, plane_axes=(3., 3., 3.)), (8, 8, 8))
    assert _rfft_eligible(StylizeConfig(zf_p=0.2), (8, 8, 8))
    assert _rfft_eligible(StylizeConfig(gibbs_alpha=0.5), (8, 9, 7))


def test_rfft_point_write_rule_exhaustive():
    """The half-grid realified-write rule (point_update's rfft mode) vs the
    full complex path, for EVERY grid point of odd/even shapes: write
    magnitude m at s keeping phase, project to real. scale = 1 on
    self-mirrored last-axis bins, 1/2 elsewhere."""
    rng = np.random.RandomState(0)
    for shape in [(4, 4, 4), (5, 4, 6), (6, 5, 7)]:
        nx, ny, nz = shape
        nzh = nz // 2 + 1
        x = rng.randn(*shape)
        k = np.fft.fftn(x)
        H0 = np.fft.rfftn(x)
        for s in np.ndindex(*shape):
            w = 3.0 * np.exp(1j * np.angle(k[s]))
            kf = k.copy()
            kf[s] = w
            want = np.fft.ifftn(kf).real
            in_half = s[2] < nzh
            c = s if in_half else tuple((n - i) % n for i, n in zip(s, shape))
            H = H0.copy()
            old = H[c] if in_half else np.conj(H[c])
            new = 3.0 * np.exp(1j * np.angle(old))
            scale = 1.0 if (c[2] == 0 or 2 * c[2] == nz) else 0.5
            d = (new - old) * scale
            H[c] += d if in_half else np.conj(d)
            got = np.fft.irfftn(H, s=shape, axes=(0, 1, 2))
            np.testing.assert_allclose(got, want, atol=1e-10)


def test_rfft_point_writes_match_complex_path():
    """Integrated check: spike/plane configs produce the same output through
    the rfft half-spectrum path as through the forced complex path."""
    import mvtb_tpu.ops.fused as fused_mod

    real_eligible = fused_mod._rfft_eligible

    def run(x, key, cfg, force_complex):
        fused_mod._rfft_eligible = ((lambda *a: False) if force_complex
                                    else real_eligible)
        try:
            return jax.jit(fused_mod.stylize_kspace,
                           static_argnames="cfg")(x, key, cfg)
        finally:
            fused_mod._rfft_eligible = real_eligible

    configs = [
        StylizeConfig(spike=True, spike_range=(2.0, 3.0)),
        StylizeConfig(spike=True, spike_channel_wise=False),  # default range
        StylizeConfig(plane_axes=(2.0, 2.0, 1.5), plane_intensity=3.0),
        StylizeConfig(disk_r=(2.0, 3.0), plane_axes=(2.5, 2.5, 1.5),
                      plane_intensity=3.0, spike=True, spike_range=(2.0, 2.5),
                      wrap_alpha=0.5, sap_p=0.05),
        StylizeConfig(spike=True, spike_range=(2.0, 3.0), spike_prob=0.5,
                      plane_axes=(2.0, 2.0, 1.5), plane_prob=0.5),
    ]
    rng = np.random.RandomState(3)
    for shape in [(2, 4, 4, 4), (2, 6, 5, 7)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        for cfg in configs:
            assert fused_mod._rfft_eligible(cfg, shape[1:])
            for i in range(12):  # small grids hit the self-mirror bins
                key = jax.random.key(i)
                a = np.asarray(run(x, key, cfg, False))
                b = np.asarray(run(x, key, cfg, True))
                scale = max(1.0, float(np.abs(b).max()))
                np.testing.assert_allclose(a, b, atol=2e-5 * scale)


def test_prob_zero_stages_are_identity():
    x = _x()
    cfg = StylizeConfig(gibbs_alpha=0.8, gibbs_prob=0.0,
                        wrap_alpha=0.1, wrap_prob=0.0,
                        sap_p=0.9, sap_prob=0.0)
    out = stylize_kspace(x, jax.random.key(0), cfg)
    assert_close(out, x, tol=1e-5)


def test_empty_config_is_passthrough():
    x = _x()
    out = stylize_kspace(x, jax.random.key(0), StylizeConfig())
    assert out is x


def test_stacked_config_runs_and_differs_per_sample():
    xb = jnp.asarray(np.random.RandomState(2).randn(3, *SHAPE).astype(np.float32))
    cfg = StylizeConfig(disk_r=(5.0, 8.0), wrap_alpha=(0.3, 0.7),
                        spike=True, spike_range=(11.0, 12.0), sap_p=0.05)
    out = jax.jit(lambda v, k: stylize_batch(v, k, cfg))(xb, jax.random.key(0))
    assert out.shape == xb.shape
    assert np.isfinite(np.asarray(out)).all()
    # per-sample keys -> different corruption per batch element
    d01 = np.abs(np.asarray(out[0] - out[1])).max()
    assert d01 > 1e-3


def _plane_loc_from_key(key, spatial, axes):
    """Replay the fused path's plane-wave shell draw (shifted coordinates)."""
    shell = ops.ellipsoid_shell_mask(spatial, *axes)
    logits = jnp.where(jnp.asarray(shell.ravel()), 0.0, -jnp.inf)
    flat = int(jax.random.categorical(key, logits))
    return tuple(int(v) for v in np.unravel_index(flat, spatial))


def test_stacked_fused_matches_sequential_reference_order():
    """Bound the fused-vs-sequential divergence at BraTS size (VERDICT #5).

    The reference's 127_ stack runs disk -> plane -> wrap -> s&p as four
    separate FFT round trips with a `.real` projection between stages
    (stylized_gibbs12p5_spikes15_wrap0p5_sap0p05_FLAIR.py:138-141). The fused
    path does one FFT pair and stays complex. With the stage draws replayed
    via stage_keys, the two must agree to float32 tolerance: the intermediate
    real projections are mathematically transparent here (masks/weights are
    Hermitian-symmetric, and a magnitude write at one k-point commutes with
    symmetrization up to conjugate pairing). Tolerance documented in
    ops/fused.py.
    """
    spatial = (128, 128, 64)
    x = jnp.asarray(np.random.RandomState(11).randn(1, *spatial)
                    .astype(np.float32))
    # disk_r=70 keeps the (55, 55, 30) shell, so the plane-wave phase is
    # well-defined on both paths (see the masked-point caveat test below)
    cfg = StylizeConfig(disk_r=70.0, disk_prob=1.0,
                        plane_axes=(55.0, 55.0, 30.0), plane_intensity=8.0,
                        plane_prob=1.0, wrap_alpha=0.5, wrap_prob=1.0,
                        sap_p=0.05, sap_prob=1.0)
    key = jax.random.key(7)
    got = np.asarray(stylize_kspace(x, key, cfg))

    ks = stage_keys(key, cfg)
    x1 = ops.fourier_disk_filter(x, 70.0, 3, False)
    loc = _plane_loc_from_key(ks["plane_loc"], spatial, (55.0, 55.0, 30.0))
    x2 = ops.plane_wave(x1, loc, 8.0)
    x3 = ops.wrap_artifact(x2, 0.5)
    u = jax.random.uniform(ks["sap_u"], x.shape, jnp.float32)
    want = np.asarray(ops.salt_and_pepper(x3, 0.05, u=u))

    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-4)


def test_stacked_fused_matches_sequential_spike_variant():
    """Same bound for the spike (KSpaceSpikeNoise) + wrap stack on a small
    odd-sized volume (odd dims exercise the asymmetric-Nyquist cases)."""
    spatial = (24, 21, 15)
    x = jnp.asarray(np.random.RandomState(3).randn(2, *spatial)
                    .astype(np.float32))
    cfg = StylizeConfig(spike=True, spike_range=(9.0, 9.0),
                        spike_channel_wise=False, spike_prob=1.0,
                        wrap_alpha=0.25, wrap_prob=1.0)
    key = jax.random.key(9)
    got = np.asarray(stylize_kspace(x, key, cfg))

    ks = stage_keys(key, cfg)
    loc_keys = jax.random.split(ks["spike_loc"], 3)
    loc = tuple(int(jax.random.randint(loc_keys[d], (), 0, spatial[d]))
                for d in range(3))
    x1 = ops.kspace_spike(x, [loc], [9.0])
    want = np.asarray(ops.wrap_artifact(x1, 0.25))

    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-4)


def test_stacked_masked_plane_point_matches_in_magnitude():
    """The 127_-family configs (disk_r=12.5 << shell) write the plane value
    at a k-point the disk mask already zeroed. There the reference's own
    phase is float roundoff noise (its extra FFT round trip re-reads
    angle(~0)), so voxelwise equality is ill-defined BY THE REFERENCE — the
    fused path pins phase 0. The physically meaningful content (a plane wave
    of magnitude e^I at the sampled frequency, riding the Gibbs-filtered
    anatomy) is phase-invariant in |FFT|: assert the two paths' k-space
    magnitudes agree.
    """
    spatial = (48, 48, 24)
    x = jnp.asarray(np.random.RandomState(5).randn(1, *spatial)
                    .astype(np.float32))
    cfg = StylizeConfig(disk_r=6.0, disk_prob=1.0,
                        plane_axes=(20.0, 20.0, 10.0), plane_intensity=7.0,
                        plane_prob=1.0)
    key = jax.random.key(21)
    got = np.asarray(stylize_kspace(x, key, cfg))

    ks = stage_keys(key, cfg)
    x1 = ops.fourier_disk_filter(x, 6.0, 3, False)
    loc = _plane_loc_from_key(ks["plane_loc"], spatial, (20.0, 20.0, 10.0))
    want = np.asarray(ops.plane_wave(x1, loc, 7.0))

    kg = np.abs(np.fft.fftn(got, axes=(-3, -2, -1)))
    kw = np.abs(np.fft.fftn(want, axes=(-3, -2, -1)))
    scale = max(1.0, kw.max())
    np.testing.assert_allclose(kg, kw, atol=5e-3 * scale, rtol=5e-3)


def test_masked_point_write_pins_phase_zero():
    """Regression (signed-zero trap): at a weight-zeroed k-point the plane
    write must pin phase 0 even when the RAW spectrum value there is
    negative. The one-pass fast path reads the point from the raw spectrum
    and multiplies by the weight afterwards — ``raw * 0.0`` keeps raw's sign
    bits, and ``jnp.angle(-0+0j)`` is pi, which silently flipped the written
    value's sign (caught by the sharded-vs-single dryrun check). The fix
    canonicalizes the weighted read with a fold-proof ``where(z == 0, 0, z)``
    select (ops/fused.py:canon_zero) — a plain ``+ (0+0j)`` is algebraically
    identical but XLA TPU folds ``x + 0 -> x`` away under excess precision.
    This CPU test cannot distinguish the two forms (CPU does not fold); it
    pins the semantic contract the TPU dryrun enforces.
    """
    spatial = (48, 48, 24)
    x = np.zeros((1,) + spatial, np.float32)
    x[0, 0, 0, 0] = -1.0  # FFT is exactly -1 everywhere: raw real part < 0
    cfg = StylizeConfig(disk_r=6.0, disk_prob=1.0,
                        plane_axes=(20.0, 20.0, 10.0), plane_intensity=7.0,
                        plane_prob=1.0)
    key = jax.random.key(21)
    out = np.asarray(stylize_kspace(jnp.asarray(x), key, cfg))

    ks = stage_keys(key, cfg)
    loc = _plane_loc_from_key(ks["plane_loc"], spatial, (20.0, 20.0, 10.0))
    raw = tuple((loc[d] - spatial[d] // 2) % spatial[d] for d in range(3))
    kv = np.fft.fftn(out[0], axes=(-3, -2, -1))[raw]
    # phase 0 -> positive real value; the final .real projection leaves
    # exp(I)/2 at the point (its conjugate pair carries the other half)
    assert kv.real > 0, f"masked-point write came out negative: {kv}"
    np.testing.assert_allclose(abs(kv), np.exp(7.0) / 2, rtol=1e-3)


def test_zero_fill_distribution():
    x = _x()
    out = stylize_kspace(x, jax.random.key(0), StylizeConfig(zf_p=1.0))
    # p=1 zeroes all of k-space
    assert float(jnp.abs(out).max()) < 1e-4
    # p=0 keeps everything (round-trip identity)
    out0 = stylize_kspace(x, jax.random.key(0), StylizeConfig(zf_p=0.0))
    assert_close(out0, x, tol=1e-5)


def test_zero_fill_rfft_realified_weight_distribution():
    """The half-spectrum zf applies the realified weight (b_i + b_-i)/2 per
    conjugate pair: recovered per-bin weights must lie in {0, 1/2, 1} with
    mean ~ 1-p (iid Bernoulli keeps), matching what the complex path's
    .real projection produces."""
    p = 0.3
    x = _x(3)
    out = stylize_kspace(x, jax.random.key(5), StylizeConfig(zf_p=p))
    kx = np.asarray(jnp.fft.rfftn(x, axes=(-3, -2, -1)))
    ko = np.asarray(jnp.fft.rfftn(out, axes=(-3, -2, -1)))
    live = np.abs(kx) > 1e-3 * np.abs(kx).max()
    w = (ko[live] / kx[live]).real
    # weights quantize to {0, 1/2, 1}
    snapped = np.round(w * 2) / 2
    assert np.abs(w - snapped).max() < 1e-2
    assert set(np.unique(snapped)).issubset({0.0, 0.5, 1.0})
    # mean keep-probability ~ 1-p (loose 3-sigma-ish bound)
    assert abs(w.mean() - (1 - p)) < 0.04


def test_grad_through_fused_gibbs():
    x = _x()

    def loss(scale):
        return jnp.sum(stylize_kspace(x * scale, jax.random.key(0),
                                      StylizeConfig(gibbs_alpha=0.5)) ** 2)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
