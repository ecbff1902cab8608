"""Transform API tests: constructor signatures, prob gates, seeded-randomness
reproduction, dict semantics, and parity with the functional ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu import ops
from mvtb_tpu import transforms as T

SHAPE = (2, 16, 14, 11)


def _data(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randn(*SHAPE).astype(np.float32),
        "label": (rng.rand(*SHAPE) > 0.7).astype(np.float32),
    }


# ----------------------------------------------------------------- basic ----

def test_select_channeld_int_and_tuple():
    d = _data()
    out = T.SelectChanneld(["image", "label"], 1)(d)
    assert out["image"].shape == (1,) + SHAPE[1:]
    np.testing.assert_array_equal(np.asarray(out["image"][0]), d["image"][1])

    out2 = T.SelectChanneld(["image", "label"], (0, 1))(_data())
    np.testing.assert_array_equal(np.asarray(out2["label"][0]), _data()["label"][1])

    with pytest.raises(AssertionError):
        T.SelectChanneld(["image", "label"], (0, 5))(_data())


def test_brats_multichannel_labels():
    lbl = np.array([[[0, 1], [2, 3]]], dtype=np.float32)[..., None]
    out = T.ConvertToMultiChannelBasedOnBratsClassesd(keys="label")({"label": lbl})
    got = out["label"]
    assert got.shape == (3,) + lbl.shape
    # TC = {2,3}, WT = {1,2,3}, ET = {2}; lbl[0] = [[0,1],[2,3]]
    np.testing.assert_array_equal(got[0, 0, :, :, 0], [[0, 0], [1, 1]])
    np.testing.assert_array_equal(got[1, 0, :, :, 0], [[0, 1], [1, 1]])
    np.testing.assert_array_equal(got[2, 0, :, :, 0], [[0, 0], [1, 0]])


def test_whole_tumor_tcga():
    lbl = np.array([[0.0, 1.0], [2.0, 0.0]])
    out = T.WholeTumorTCGA(keys="label")({"label": lbl})
    assert out["label"].shape == (1, 2, 2)
    np.testing.assert_array_equal(out["label"][0], [[0, 1], [1, 0]])


# ------------------------------------------------------------ rand gates ----

def test_prob_zero_is_identity():
    d = _data()
    t = T.RandFourierDiskMaskd(keys="image", r=5.0, prob=0.0)
    out = t(d)
    np.testing.assert_array_equal(np.asarray(out["image"]), d["image"])


def test_rand_fourier_disk_prob1_matches_op():
    d = _data()
    t = T.RandFourierDiskMaskd(keys="image", r=5.0, inside_off=False, prob=1.0)
    out = t(d)
    want = ops.fourier_disk_filter(jnp.asarray(d["image"]), 5.0, 3, False)
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(want))


def test_rand_fourier_disk_list_radius_sampled_once():
    t = T.RandFourierDiskMaskd(keys="image", r=[5.0, 10.0], prob=1.0)
    t.set_random_state(0)
    t(_data())
    r1 = t.r
    t(_data())
    assert isinstance(r1, float) and t.r == r1  # reference quirk: fixed after 1st draw
    assert 5.0 <= r1 <= 10.0


def test_rand_gibbs_seeded_reproduction():
    t1 = T.RandGibbsNoise(prob=1.0, alpha=(0.2, 0.8)).set_random_state(42)
    t2 = T.RandGibbsNoise(prob=1.0, alpha=(0.2, 0.8)).set_random_state(42)
    x = _data()["image"]
    o1, o2 = t1(x), t2(x)
    assert t1.sampled_alpha == t2.sampled_alpha
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_rand_gibbs_matches_np_randomstate_stream():
    # The reference draws R.rand() (gate) then R.uniform(a, b).
    t = T.RandGibbsNoise(prob=1.0, alpha=(0.0, 1.0)).set_random_state(7)
    t(_data()["image"])
    ref = np.random.RandomState(7)
    ref.rand()
    assert t.sampled_alpha == ref.uniform(0.0, 1.0)


def test_rand_gibbsd_shares_alpha_across_keys():
    d = _data()
    t = T.RandGibbsNoised(keys=["image", "label"], prob=1.0, alpha=(0.3, 0.3))
    out = t(d)
    wi = ops.gibbs_noise(jnp.asarray(d["image"]), t.sampled_alpha)
    wl = ops.gibbs_noise(jnp.asarray(d["label"]), t.sampled_alpha)
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(wi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["label"]), np.asarray(wl), atol=1e-6)


def test_gibbs_as_tensor_output_false_returns_numpy():
    out = T.GibbsNoise(0.5, as_tensor_output=False)(_data()["image"])
    assert isinstance(out, np.ndarray)


# -------------------------------------------------------------- spikes ----

def test_kspace_spike_noise_signature_checks():
    with pytest.raises(AssertionError):
        T.KSpaceSpikeNoise(loc=(1, 2, 3), k_intensity=[1.0, 2.0])
    with pytest.raises(AssertionError):
        T.KSpaceSpikeNoise(loc=[(1, 2, 3), (2, 3, 4)], k_intensity=1.0)
    with pytest.raises(AssertionError):
        t = T.KSpaceSpikeNoise(loc=(50, 2, 3), k_intensity=1.0)
        t(_data()["image"])


def test_rand_spike_randomize_stream_matches_reference_order():
    x = _data()["image"]
    t = T.RandKSpaceSpikeNoise(prob=1.0, intensity_range=(12.0, 13.0),
                               channel_wise=True)
    t.set_random_state(3)
    t(x)
    ref = np.random.RandomState(3)
    expected_locs, expected_ints = [], []
    for i in range(x.shape[0]):
        assert ref.rand() < 1.0
        expected_locs.append((i,) + tuple(ref.randint(0, k) for k in x.shape[1:]))
        expected_ints.append(ref.uniform(12.0, 13.0))
    assert t.sampled_locs == expected_locs
    assert t.sampled_k_intensity == expected_ints


def test_rand_spike_not_channel_wise_shares_loc():
    x = _data()["image"]
    t = T.RandKSpaceSpikeNoise(prob=1.0, intensity_range=(12.0, 13.0),
                               channel_wise=False)
    t.set_random_state(1)
    t(x)
    spatial = {loc[1:] for loc in t.sampled_locs}
    assert len(spatial) == 1 and len(t.sampled_locs) == x.shape[0]


def test_rand_spiked_common_sampling_same_spikes_for_image_and_label():
    d = _data()
    t = T.RandKSpaceSpikeNoised(
        keys=["image", "label"], global_prob=1.0, prob=1.0,
        intensity_ranges={"image": (12, 13), "label": (12, 13)},
        channel_wise=True, common_sampling=True, common_seed=42,
    )
    t(d)
    assert t.transforms["image"].sampled_locs == t.transforms["label"].sampled_locs
    assert t.transforms["image"].sampled_k_intensity == \
        t.transforms["label"].sampled_k_intensity


def test_rand_spike_default_range_uses_data_stats():
    x = _data()["image"]
    t = T.RandKSpaceSpikeNoise(prob=1.0, intensity_range=None, channel_wise=True)
    t.set_random_state(0)
    t(x)
    stats = np.asarray(ops.default_spike_intensity_stats(jnp.asarray(x)))
    for loc, val in zip(t.sampled_locs, t.sampled_k_intensity):
        c = loc[0]
        assert stats[c] * 0.95 <= val <= stats[c] * 1.1


# ------------------------------------------------------ plane waves etc. ----

def test_plane_waves_ellipsoid_matches_op():
    d = _data()
    t = T.RandPlaneWaves_ellipsoid("image", a=6, b=5, c=4, intensity_value=12.0,
                                   prob=1.0)
    t.set_random_state(0)
    out = t(d)
    want = ops.plane_wave(jnp.asarray(d["image"]), t.idx, 12.0, 3)
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(want))
    shell = ops.ellipsoid_shell_mask(SHAPE[1:], 6, 5, 4)
    assert shell[t.idx]


def test_salt_and_pepper_dict_fraction():
    d = _data()
    t = T.SaltAndPepper(p=0.5, keys="image", prob=1.0)
    t.set_random_state(0)
    out = t(d)
    x = d["image"]
    changed = np.mean(np.asarray(out["image"]) != x)
    assert 0.4 < changed < 0.6


def test_wrap_artifactd_matches_op():
    d = _data()
    out = T.WrapArtifactd(keys="image", alpha=0.25)(d)
    want = ops.wrap_artifact(jnp.asarray(d["image"]), 0.25, 3)
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(want))


def test_segmentation_slicesd():
    rng = np.random.RandomState(0)
    img = rng.randn(1, 8, 9, 64).astype(np.float32)
    lbl = np.zeros((1, 8, 9, 64), np.float32)
    lbl[0, :, :, :] = 1.0  # label present everywhere -> any c works
    t = T.SegmentationSlicesd(keys=["image", "label"], seed=0)
    out = t({"image": img, "label": lbl})
    assert out["image"].shape == (3, 9, 8)
    assert out["label"].shape == (3, 9, 8)


def test_recompose_append_and_add():
    base = T.ReCompose([T.SelectChanneld(["image"], 0)])
    base.append(T.WrapArtifactd(keys="image", alpha=0.5))
    assert len(base) == 2
    extended = base + T.SaltAndPepper(p=0.1, keys="image")
    assert len(extended) == 3 and len(base) == 2
    out = base(_data())
    assert out["image"].shape == (1,) + SHAPE[1:]


def test_randzf_p0_identity():
    x = _data()["image"]
    out = T.RandZF(0.0)(x)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)
