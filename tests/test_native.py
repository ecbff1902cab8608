"""Native C++ resampler: bit-parity with the scipy reference path and the
graceful fallback contract."""

import numpy as np
import pytest

from mvtb_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain in this env")


def _scipy_ref(vol, m, out_shape, order):
    from scipy.ndimage import map_coordinates

    grids = np.meshgrid(*[np.arange(n, dtype=np.float64) for n in out_shape],
                        indexing="ij")
    pts = np.stack([g.ravel() for g in grids])
    coords = (m[:3, :3] @ pts + m[:3, 3:4]).reshape((3,) + tuple(out_shape))
    return np.stack([
        map_coordinates(vol[c].astype(np.float64), coords, order=order,
                        mode="nearest")
        for c in range(vol.shape[0])
    ]).astype(np.float32)


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("scale", [0.5, 0.77, 1.0, 2.0])
def test_native_matches_scipy(order, scale):
    rng = np.random.RandomState(int(scale * 100) + order)
    vol = rng.rand(3, 15, 14, 13).astype(np.float32)
    m = np.zeros((3, 4))
    m[0, 0], m[1, 1], m[2, 2] = scale, scale * 1.2, scale * 0.8
    m[:, 3] = [0.25, -0.4, 1.1]
    out_shape = (10, 9, 8)
    nat = native.resample3d(vol, m, out_shape, order)
    ref = _scipy_ref(vol, m, out_shape, order)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_resample_to_spacing_uses_native_and_matches_fallback():
    from mvtb_tpu.data.preprocess import resample_to_spacing

    vol = np.random.RandomState(3).rand(2, 21, 19, 17).astype(np.float32)
    aff = np.diag([1.0, 1.0, 1.0, 1.0])
    out_native, aff_n = resample_to_spacing(vol, aff, (1.5, 1.5, 2.0))

    orig = native.resample3d
    try:
        native.resample3d = lambda *a, **k: None  # force scipy path
        out_scipy, aff_s = resample_to_spacing(vol, aff, (1.5, 1.5, 2.0))
    finally:
        native.resample3d = orig
    np.testing.assert_allclose(out_native, out_scipy, atol=1e-6)
    np.testing.assert_array_equal(aff_n, aff_s)


def test_nearest_preserves_label_values():
    vol = np.random.RandomState(1).randint(0, 4, (1, 12, 12, 12)).astype(np.float32)
    m = np.zeros((3, 4))
    m[0, 0] = m[1, 1] = m[2, 2] = 1.5
    out = native.resample3d(vol, m, (8, 8, 8), 0)
    assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0})
