"""Reference-script compatibility: bare-module imports and the exact
constructor calls the 10_scripts templates make."""

import numpy as np


def test_reference_script_imports_and_constructors():
    from mvtb_tpu import compat

    compat.install()

    # the imports the reference scripts perform (baseline.py:65-66, etc.)
    from filters_and_operators import (  # noqa: F401
        RandFourierDiskMaskd,
        RandGibbsNoised,
        RandKSpaceSpikeNoised,
        SaltAndPepper,
        WrapArtifactd,
        SelectChanneld,
        ConvertToMultiChannelBasedOnBratsClassesd,
        WholeTumorTCGA,
        RandPlaneWaves_ellipsoid,
    )
    from stylization_layers import Gibbs_UNet, Spikes_UNet, GibbsNoiseLayer  # noqa: F401
    from utils import ReCompose, model_evaluation, BratsValIterDataset  # noqa: F401

    # constructor calls exactly as the scripts write them
    t1 = RandFourierDiskMaskd(keys='image', r=12.5, inside_off=False, prob=1.)
    # (script uses a,b,c = 55,55,30 on 128x128x64 crops; scale to test volume)
    t2 = RandPlaneWaves_ellipsoid('image', 5, 5, 3, intensity_value=14, prob=1)
    t3 = SaltAndPepper(0.15, 'image')
    t4 = WrapArtifactd("image", 0.5)
    t5 = RandGibbsNoised("image", 1.0)
    t6 = RandKSpaceSpikeNoised("image", prob=0.5,
                               intensity_ranges={"image": (13, 15)},
                               channel_wise=True)
    t7 = SelectChanneld(["image", "label"], (1, 0))

    data = {"image": np.random.RandomState(0).randn(2, 16, 16, 8).astype(np.float32),
            "label": np.random.RandomState(1).rand(2, 16, 16, 8).astype(np.float32)}
    for t in (t1, t2, t3, t4, t5, t6):
        out = t(dict(data))
        assert out["image"].shape == data["image"].shape
    out = t7(dict(data))
    assert out["image"].shape == (1, 16, 16, 8)


def test_compat_disk_mask_and_ellipsoid_objects():
    import jax.numpy as jnp

    from mvtb_tpu import compat

    compat.install()
    from filters_and_operators import disk_mask, ellipsoid

    k = jnp.ones((2, 8, 8))
    m = disk_mask(k, r=3, dim=2, inside_off=True)
    out = m.apply(k)
    assert out.shape == k.shape
    assert float(out[0, 4, 4]) == 0.0  # center masked off

    e = ellipsoid(4, 4, 3)
    k3 = np.ones((1, 12, 12, 8))
    mask = e.binary_mask_3d(k3)
    assert mask.shape == k3.shape
    coord = e.sample_ellipsoid(k3)
    assert len(coord) == 3


def test_set_determinism_and_steptimer():
    import numpy as np

    from mvtb_tpu.utils import StepTimer, set_determinism

    key = set_determinism(0)
    a = np.random.rand(3)
    set_determinism(0)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert key is not None

    t = StepTimer(warmup=1)
    import time
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary(items_per_step=2)
    assert s["steps"] == 3 and s["items_per_sec"] > 0


def test_compat_show_functions_run():
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from mvtb_tpu.compat.utils import WL_to_LH, show, show_slice_and_fourier

    assert WL_to_LH(10, 5) == (0, 10)
    show(np.random.rand(8, 8), k_space=False)
    show_slice_and_fourier(np.random.rand(16, 16))
