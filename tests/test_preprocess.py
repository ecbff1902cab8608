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


def test_resample_doubles_shape_when_halving_spacing():
    vol = np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    out, new_aff = resample_to_spacing(vol, aff, (1.0, 1.0, 1.0))
    assert out.shape == (1, 16, 16, 16)
    assert np.allclose(np.linalg.norm(new_aff[:3, :3], axis=0), 1.0)


def test_resample_identity_when_spacing_matches():
    vol = np.random.RandomState(0).rand(1, 6, 6, 6).astype(np.float32)
    out, _ = resample_to_spacing(vol, np.eye(4), (1.0, 1.0, 1.0))
    np.testing.assert_allclose(out, vol, atol=1e-6)


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
