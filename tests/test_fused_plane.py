"""Fused plane-kernel path (ops/fused_plane.py) vs the matmul-DFT path.

``fft_backend="plane"`` must reproduce ``stylize_kspace``'s output for every
eligible stage combination: the random draws are bit-identical by key-stream
construction, so any disagreement beyond matmul rounding is a semantics bug.
Interpret mode is exact on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.ops import StylizeConfig
from mvtb_tpu.ops.fused import stylize_kspace
from mvtb_tpu.ops.fused_plane import plane_kernel_eligible

KEY = jax.random.key(3)


def vol(c=2, h=16, w=12, d=10, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(c, h, w, d)
                       .astype(np.float32))


def compare(cfg_kwargs, x=None, tol=1e-4):
    # "plane" runs its dots at bf16x3 (~1e-5 relative); stacked configs
    # with exp-scale point writes amplify that a few times
    x = vol() if x is None else x
    ref = stylize_kspace(x, KEY, StylizeConfig(**cfg_kwargs,
                                               fft_backend="dft"))
    got = stylize_kspace(x, KEY, StylizeConfig(**cfg_kwargs,
                                               fft_backend="plane"))
    assert plane_kernel_eligible(StylizeConfig(**cfg_kwargs), x.shape[1:])
    scale = float(jnp.abs(ref).max()) + 1e-12
    err = float(jnp.abs(ref - got).max()) / scale
    assert err < tol, (cfg_kwargs, err)
    return np.asarray(got)


@pytest.mark.parametrize("kw", [
    dict(disk_r=6.0),
    dict(disk_r=6.0, disk_inside_off=True),
    dict(gibbs_alpha=0.4),                      # even axes: symmetrized mask
    dict(wrap_alpha=0.25),
    dict(gibbs_alpha=0.3, disk_r=7.0, wrap_alpha=0.75),
    dict(spike=True, spike_range=(10.0, 11.0)),
    dict(spike=True, spike_range=(10.0, 11.0), spike_channel_wise=False),
    dict(plane_axes=(6.0, 5.0, 4.0), plane_intensity=9.0),
    dict(disk_r=12.5, plane_axes=(6.0, 5.0, 4.0), plane_intensity=9.0),
    dict(disk_r=6.0, wrap_alpha=0.5, spike=True, spike_range=(9.0, 10.0),
         plane_axes=(6.0, 5.0, 4.0), plane_intensity=8.0),
    dict(gibbs_alpha=(0.2, 0.5), disk_r=(5.0, 8.0), wrap_alpha=(0.3, 0.8),
         spike=True, spike_range=(9.0, 10.0)),
])
def test_plane_matches_dft(kw):
    compare(kw)


def test_plane_with_sap_matches():
    # s&p rides the same key stream on the plane path's output
    compare(dict(disk_r=6.0, sap_p=0.4), tol=2e-5)


def test_plane_odd_h_axis():
    compare(dict(disk_r=5.0, wrap_alpha=0.5), x=vol(h=15))


def test_plane_gated_stages_match():
    # prob < 1: gate draws must line up exactly across both paths
    for seed in range(4):
        key = jax.random.key(seed)
        cfg_d = StylizeConfig(disk_r=6.0, disk_prob=0.5, wrap_alpha=0.4,
                              wrap_prob=0.5, fft_backend="dft")
        cfg_p = StylizeConfig(disk_r=6.0, disk_prob=0.5, wrap_alpha=0.4,
                              wrap_prob=0.5, fft_backend="plane")
        x = vol(seed=seed)
        ref = stylize_kspace(x, key, cfg_d)
        got = stylize_kspace(x, key, cfg_p)
        err = float(jnp.abs(ref - got).max()) / float(jnp.abs(ref).max())
        assert err < 2e-5, (seed, err)


def test_plane_batch_vmap():
    x = jnp.asarray(np.random.RandomState(1).randn(3, 2, 16, 12, 10)
                    .astype(np.float32))
    from mvtb_tpu.ops.fused import stylize_batch

    cfg = StylizeConfig(disk_r=6.0, wrap_alpha=0.5, spike=True,
                        spike_range=(9.0, 10.0), fft_backend="plane")
    ref_cfg = StylizeConfig(disk_r=6.0, wrap_alpha=0.5, spike=True,
                            spike_range=(9.0, 10.0), fft_backend="dft")
    got = stylize_batch(x, KEY, cfg)
    ref = stylize_batch(x, KEY, ref_cfg)
    err = float(jnp.abs(ref - got).max()) / float(jnp.abs(ref).max())
    assert err < 2e-5, err


def test_ineligible_configs_fall_back():
    x = vol()
    # zero-fill forces the sequential path; must still run via fallback
    cfg = StylizeConfig(disk_r=6.0, zf_p=0.3, fft_backend="plane")
    assert not plane_kernel_eligible(cfg, x.shape[1:])
    out = stylize_kspace(x, KEY, cfg)
    ref = stylize_kspace(x, KEY, StylizeConfig(disk_r=6.0, zf_p=0.3,
                                               fft_backend="dft"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # data-dependent spike range likewise
    cfg2 = StylizeConfig(spike=True, fft_backend="plane")
    assert not plane_kernel_eligible(cfg2, x.shape[1:])
    out2 = stylize_kspace(x, KEY, cfg2)
    assert np.isfinite(np.asarray(out2)).all()


def test_vmem_guard_rejects_oversized_planes():
    # 512x512 planes: 12 resident (n,n) f32 matrices (~12.6 MB) + the
    # double-buffered tiles exceed VMEM — must fall back, not compile-crash
    from mvtb_tpu.ops.fused_plane import _plane_vmem_bytes, _VMEM_BUDGET

    cfg = StylizeConfig(disk_r=6.0)
    assert _plane_vmem_bytes(512, 512) > _VMEM_BUDGET
    assert not plane_kernel_eligible(cfg, (64, 512, 512))
    assert plane_kernel_eligible(cfg, (240, 240, 155))  # headline stays in


def test_plane_2d_falls_back():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 12)
                    .astype(np.float32))
    cfg = StylizeConfig(n_dims=2, disk_r=4.0, fft_backend="plane")
    ref = stylize_kspace(x, KEY, StylizeConfig(n_dims=2, disk_r=4.0,
                                               fft_backend="dft"))
    got = stylize_kspace(x, KEY, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
