"""MONAI-equivalent preprocessing: resampling, orientation, crops, normalize."""

import numpy as np
import pytest

from mvtb_tpu.data.preprocess import (
    CenterSpatialCropd,
    NormalizeIntensityd,
    RandSpatialCropd,
    center_crop,
    normalize_nonzero,
    orientation_from_affine,
    reorient,
    resample_to_spacing,
)
from mvtb_tpu.data.pipeline import Loader, brats_val_pipeline
from mvtb_tpu.data.synthetic import decathlon_style_dicts


def test_orientation_codes():
    assert orientation_from_affine(np.eye(4)) == "RAS"
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])
    assert orientation_from_affine(aff) == "LAS"


def test_reorient_las_to_ras_flips_x():
    vol = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])
    out, new_aff = reorient(vol, aff, "RAS")
    np.testing.assert_array_equal(out, vol[:, ::-1])
    assert orientation_from_affine(new_aff) == "RAS"


def test_resample_shape_follows_monai_corner_rule():
    """MONAI 0.4/0.5 Spacing output shape = round((n-1)*old/new + 1) per axis
    (corner extents, round-half-even) — NOT ceil(n*old/new)."""
    vol = np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    out, new_aff = resample_to_spacing(vol, aff, (1.0, 1.0, 1.0))
    assert out.shape == (1, 15, 15, 15)  # round(7*2/1 + 1), not 16
    assert np.allclose(np.linalg.norm(new_aff[:3, :3], axis=0), 1.0)

    # the case where the naive ceil rule diverges: 11 voxels, 1.0 -> 4.0 mm
    vol11 = np.zeros((1, 11, 11, 11), np.float32)
    out11, _ = resample_to_spacing(vol11, np.eye(4), (4.0, 4.0, 4.0))
    assert out11.shape == (1, 4, 4, 4)  # round(10/4 + 1) = 4; ceil gives 3

    # BraTS headline shapes are unchanged by the corner rule
    vol_brats = np.zeros((1, 16, 16, 155), np.float32)
    out_b, _ = resample_to_spacing(vol_brats, np.eye(4), (1.0, 1.0, 2.0))
    assert out_b.shape[-1] == 78  # round(154/2 + 1)


def test_resample_identity_when_spacing_matches():
    vol = np.random.RandomState(0).rand(1, 6, 6, 6).astype(np.float32)
    out, _ = resample_to_spacing(vol, np.eye(4), (1.0, 1.0, 1.0))
    np.testing.assert_allclose(out, vol, atol=1e-6)


def test_resample_grid_anchoring_goldens():
    """Output voxel j samples input coordinate j*new/old (corner-anchored),
    with border clamping — hand-computed goldens for both interp orders."""
    v = np.arange(5, dtype=np.float32)
    vol = np.broadcast_to(v[:, None, None], (5, 5, 5)).copy()[None]

    out0, _ = resample_to_spacing(vol, np.eye(4), (2.0, 2.0, 2.0),
                                  mode="nearest")
    assert out0.shape == (1, 3, 3, 3)
    np.testing.assert_array_equal(out0[0, :, 0, 0], [0.0, 2.0, 4.0])

    out1, _ = resample_to_spacing(vol, np.eye(4), (1.5, 1.5, 1.5),
                                  mode="bilinear")
    assert out1.shape == (1, 4, 4, 4)
    # coords 0, 1.5, 3.0, 4.5 (clamped to border 4) -> 0, 1.5, 3, 4
    np.testing.assert_allclose(out1[0, :, 0, 0], [0.0, 1.5, 3.0, 4.0],
                               atol=1e-6)


def test_resample_with_flipped_affine():
    """A negative-direction affine keeps MONAI semantics: zoom_affine keeps
    the direction sign and the corner offset anchors voxel 0."""
    v = np.arange(5, dtype=np.float32)
    vol = np.broadcast_to(v[:, None, None], (5, 5, 5)).copy()[None]
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])
    aff[0, 3] = 4.0  # x_world = 4 - i
    out, new_aff = resample_to_spacing(vol, aff, (2.0, 2.0, 2.0),
                                       mode="nearest")
    assert out.shape == (1, 3, 3, 3)
    np.testing.assert_array_equal(out[0, :, 0, 0], [0.0, 2.0, 4.0])
    assert new_aff[0, 0] == -2.0  # direction preserved


def test_center_crop_and_pad():
    vol = np.arange(1 * 6 * 6 * 6, dtype=np.float32).reshape(1, 6, 6, 6)
    out = center_crop(vol, (4, 4, 4))
    np.testing.assert_array_equal(out, vol[:, 1:5, 1:5, 1:5])
    padded = center_crop(vol, (8, 8, 8))
    assert padded.shape == (1, 8, 8, 8)
    np.testing.assert_array_equal(padded[:, 1:7, 1:7, 1:7], vol)


def test_normalize_nonzero_keeps_zeros():
    vol = np.zeros((1, 4, 4, 4), np.float32)
    vol[0, :2] = np.random.RandomState(0).rand(2, 4, 4) + 1
    out = normalize_nonzero(vol)
    assert (out[0, 2:] == 0).all()
    nz = out[out != 0]
    assert abs(nz.mean()) < 1e-5 and abs(nz.std() - 1) < 1e-4


def test_rand_crop_same_region_for_image_and_label():
    rng_data = np.random.RandomState(0)
    d = {"image": rng_data.rand(1, 8, 8, 8).astype(np.float32)}
    d["label"] = d["image"].copy()
    t = RandSpatialCropd(keys=["image", "label"], roi_size=(4, 4, 4))
    t.set_random_state(3)
    out = t(d)
    np.testing.assert_array_equal(out["image"], out["label"])
    assert out["image"].shape == (1, 4, 4, 4)


def test_val_pipeline_end_to_end():
    # synthetic sample in "raw NIfTI" layout: image (X,Y,Z,C), label (X,Y,Z)
    rng = np.random.RandomState(0)
    sample = {
        "image": rng.rand(24, 24, 12, 4).astype(np.float32),
        "label": rng.randint(0, 4, (24, 24, 12)).astype(np.float32),
        "affine": np.eye(4),
    }
    pipe = brats_val_pipeline(roi_size=(16, 16, 8), pixdim=(1.0, 1.0, 1.0))
    out = pipe(sample)
    assert out["image"].shape == (4, 16, 16, 8)
    assert out["label"].shape == (3, 16, 16, 8)
    assert set(np.unique(out["label"])) <= {0.0, 1.0}


def test_loader_batching():
    samples = decathlon_style_dicts(0, 5, channels=1, spatial=(8, 8, 4),
                                    n_classes=1)
    loader = Loader(samples, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3 and len(loader) == 3
    assert batches[0]["image"].shape == (2, 1, 8, 8, 4)
    assert batches[-1]["image"].shape == (1, 1, 8, 8, 4)
    assert len(list(Loader(samples, batch_size=2, drop_last=True))) == 2
