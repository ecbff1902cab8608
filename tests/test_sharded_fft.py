"""SPMD-sharded k-space filtering matches the single-chip fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.ops.fused import StylizeConfig, stylize_kspace
from mvtb_tpu.parallel import make_mesh
from mvtb_tpu.parallel.sharded_fft import stylize_kspace_sharded

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

SHAPE = (2, 16, 24, 10)  # (C, H, W, D); H, W divisible by 8


def _x(seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*SHAPE).astype(np.float32))


@pytest.mark.parametrize("cfg", [
    StylizeConfig(disk_r=5.0),
    StylizeConfig(gibbs_alpha=0.4),
    StylizeConfig(wrap_alpha=0.25),
    StylizeConfig(disk_r=6.0, wrap_alpha=0.5),
    StylizeConfig(gibbs_alpha=0.3, disk_r=7.0, wrap_alpha=0.75),
    # fixed-location magnitude-domain stages match bit-for-bit too
    StylizeConfig(spike=True, spike_range=(11.0, 11.0),
                  spike_channel_wise=False),
    StylizeConfig(spike=True, spike_range=(10.0, 12.0),
                  spike_channel_wise=True),
    StylizeConfig(plane_axes=(6.0, 8.0, 4.0), plane_intensity=10.0),
    StylizeConfig(disk_r=6.0, wrap_alpha=0.5, spike=True,
                  spike_range=(11.0, 11.0), spike_channel_wise=False,
                  plane_axes=(6.0, 8.0, 4.0), plane_intensity=10.0),
    StylizeConfig(spike=True),  # data-dependent default range (psum stats)
    # dense random fields: global-coordinate draws match the single-chip
    # stream exactly (round-2 VERDICT item 5)
    StylizeConfig(zf_p=0.3),
    StylizeConfig(sap_p=0.15),
    StylizeConfig(disk_r=6.0, zf_p=0.25, sap_p=0.1),
    # zf + point writes: the written point READS the zf'd spectrum, so this
    # only matches if the sharded zf state equals the half-grid pair weight
    # pointwise (see _zf_weight_full)
    StylizeConfig(zf_p=0.3, spike=True, spike_range=(10.0, 12.0)),
    StylizeConfig(zf_p=0.3, plane_axes=(6.0, 8.0, 4.0),
                  plane_intensity=10.0),
])
def test_sharded_matches_single_chip(cfg):
    x = _x()
    mesh = make_mesh()
    got = stylize_kspace_sharded(x, jax.random.key(0), cfg, mesh)
    want = stylize_kspace(x, jax.random.key(0), cfg)
    scale = max(1.0, float(jnp.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4 * scale, rtol=1e-4)
    # result keeps the H-sharded layout
    assert len(got.sharding.device_set) == 8


@pytest.mark.parametrize("backend", ["dft", "hybrid"])
def test_sharded_matmul_backends_match_single_chip(backend):
    """The per-shard transforms route through the same backend resolver as
    the single-chip path (on accelerators "auto" is the matmul-DFT, which
    also sidesteps the TPU FFT innermost-axis restriction for the axis-1
    inverse). Forced here since CPU's auto is jnp.fft."""
    x = _x(4)
    mesh = make_mesh()
    cfg = StylizeConfig(disk_r=6.0, wrap_alpha=0.5,
                        plane_axes=(6.0, 8.0, 4.0), plane_intensity=10.0,
                        fft_backend=backend)
    got = stylize_kspace_sharded(x, jax.random.key(2), cfg, mesh)
    want = stylize_kspace(x, jax.random.key(2), cfg)
    scale = max(1.0, float(jnp.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * scale, rtol=2e-4)


def test_sharded_sap_distribution():
    mesh = make_mesh()
    x = _x()
    cfg = StylizeConfig(sap_p=0.4)
    out = np.asarray(stylize_kspace_sharded(x, jax.random.key(1), cfg, mesh))
    xx = np.asarray(x)
    changed = (out != xx).mean()
    assert 0.3 < changed < 0.5
    lo, hi = xx.min() / 2, xx.max() / 2
    assert np.isclose(out, lo).any() and np.isclose(out, hi).any()


def test_sharded_zero_fill_full():
    mesh = make_mesh()
    out = stylize_kspace_sharded(_x(), jax.random.key(0),
                                 StylizeConfig(zf_p=1.0), mesh)
    assert float(jnp.abs(out).max()) < 1e-4


def test_sharded_shape_validation():
    mesh = make_mesh()
    bad = jnp.zeros((1, 15, 16, 8))  # H=15 not divisible by 8
    with pytest.raises(ValueError):
        stylize_kspace_sharded(bad, jax.random.key(0),
                               StylizeConfig(disk_r=3.0), mesh)
