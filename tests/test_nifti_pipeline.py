"""NIfTI reader + Decathlon dataset + BratsValIterDataset end to end on a
synthetic on-disk Decathlon tree."""

import json
import os
import struct

import numpy as np
import pytest

from mvtb_tpu.data import BratsValIterDataset, DecathlonDataset, read_nifti
from mvtb_tpu.data.pipeline import brats_val_pipeline
from mvtb_tpu.transforms import WrapArtifactd


def _write_nifti(path, data, affine=np.eye(4)):
    data = np.asarray(data, np.float32)
    header = bytearray(352)
    struct.pack_into("<i", header, 0, 348)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, 16)  # float32
    struct.pack_into("<h", header, 72, 32)
    struct.pack_into("<f", header, 108, 352)  # vox_offset
    struct.pack_into("<f", header, 112, 1.0)  # scl_slope
    struct.pack_into("<4f", header, 280, *affine[0])
    struct.pack_into("<4f", header, 296, *affine[1])
    struct.pack_into("<4f", header, 312, *affine[2])
    with open(path, "wb") as f:
        f.write(header)
        f.write(data.tobytes(order="F"))


@pytest.fixture
def decathlon_root(tmp_path):
    task = tmp_path / "Task01_BrainTumour"
    (task / "imagesTr").mkdir(parents=True)
    (task / "labelsTr").mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(10):
        img = rng.randn(20, 20, 12, 4).astype(np.float32)
        lbl = rng.randint(0, 4, (20, 20, 12)).astype(np.float32)
        _write_nifti(str(task / f"imagesTr/case{i}.nii"), img)
        _write_nifti(str(task / f"labelsTr/case{i}.nii"), lbl)
        entries.append({"image": f"imagesTr/case{i}.nii",
                        "label": f"labelsTr/case{i}.nii"})
    with open(task / "dataset.json", "w") as f:
        json.dump({"training": entries}, f)
    return str(tmp_path)


def test_read_nifti_roundtrip(decathlon_root):
    rng = np.random.RandomState(0)
    want_img = rng.randn(20, 20, 12, 4).astype(np.float32)
    arr, affine = read_nifti(os.path.join(
        decathlon_root, "Task01_BrainTumour/imagesTr/case0.nii"))
    np.testing.assert_array_equal(arr, want_img)
    np.testing.assert_array_equal(affine, np.eye(4))


def test_decathlon_dataset_sections(decathlon_root):
    train = DecathlonDataset(decathlon_root, section="training")
    val = DecathlonDataset(decathlon_root, section="validation")
    assert len(train) == 8 and len(val) == 2
    s = train._load_raw(train.entries[0])
    assert s["image"].shape == (20, 20, 12, 4)


def test_decathlon_split_membership_matches_monai_rule():
    """MONAI _split_datalist golden: RandomState(0).shuffle(arange(10)) =
    [2,8,4,9,1,6,7,3,0,5]; validation = first int(10*0.2) = entries 2 and 8,
    training = the remaining eight in shuffled order."""
    import numpy as np

    entries = [{"image": f"img{i}", "label": f"lbl{i}"} for i in range(10)]
    idx = np.arange(10)
    np.random.RandomState(0).shuffle(idx)
    assert idx.tolist() == [2, 8, 4, 9, 1, 6, 7, 3, 0, 5]

    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        task = os.path.join(root, "Task01_BrainTumour")
        os.makedirs(task)
        with open(os.path.join(task, "dataset.json"), "w") as f:
            _json.dump({"training": entries}, f)
        val = DecathlonDataset(root, section="validation")
        train = DecathlonDataset(root, section="training")
    assert [e["image"] for e in val.entries] == ["img2", "img8"]
    assert [e["image"] for e in train.entries] == \
        ["img4", "img9", "img1", "img6", "img7", "img3", "img0", "img5"]


def test_decathlon_with_pipeline_and_cache(decathlon_root, tmp_path):
    ds = DecathlonDataset(decathlon_root, section="validation",
                          transform=brats_val_pipeline((16, 16, 8)),
                          cache_dir=str(tmp_path / "cache"))
    s = ds[0]
    assert s["image"].shape == (4, 16, 16, 8)
    assert s["label"].shape == (3, 16, 16, 8)
    # second access hits the npz cache
    s2 = ds[0]
    np.testing.assert_array_equal(np.asarray(s["image"]),
                                  np.asarray(s2["image"]))


def test_brats_val_iter_dataset_sweep(decathlon_root):
    sweep = BratsValIterDataset(
        decathlon_root,
        transforms={"clean": None,
                    "wrap": WrapArtifactd(keys="image", alpha=0.5)},
        return_loader=True)
    seen = {}
    for name, loader in sweep:
        batch = next(iter(loader))
        assert batch["image"].shape == (1, 4, 128, 128, 64)
        assert batch["label"].shape == (1, 3, 128, 128, 64)
        seen[name] = np.asarray(batch["image"])
    assert set(seen) == {"clean", "wrap"}
    assert not np.allclose(seen["clean"], seen["wrap"])

    ds = BratsValIterDataset(decathlon_root, transforms={"clean": None})["clean"]
    assert len(ds) == 1
    assert ds[0]["image"].shape == (4, 128, 128, 64)
