"""Native (C++) NIfTI-1 decoder vs the pure-Python reader, bit-for-bit.

The native path (mvtb_tpu/native/nifti.cpp) fuses gzip inflate, dtype
conversion, and scl scaling into one pass; these tests pin its output to the
pure-Python parser (`read_nifti(prefer_native=False)`) across every
supported dtype, gzip on/off, scaling on/off, header gaps, and affines.
Reference ingest being matched: nibabel/MONAI LoadImaged
(source_code/baseline.py:116-130).
"""

import gzip
import os
import struct

import numpy as np
import pytest

from mvtb_tpu import native
from mvtb_tpu.data.nifti import read_nifti

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

DTYPES = [(2, np.uint8), (4, np.int16), (8, np.int32), (16, np.float32),
          (64, np.float64), (256, np.int8), (512, np.uint16),
          (768, np.uint32)]


def write_nifti(path, data, dtype_code, slope=1.0, inter=0.0, gz=False,
                affine=np.eye(4), vox_offset=352):
    header = bytearray(vox_offset)
    struct.pack_into("<i", header, 0, 348)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, dtype_code)
    struct.pack_into("<f", header, 108, vox_offset)
    struct.pack_into("<f", header, 112, slope)
    struct.pack_into("<f", header, 116, inter)
    struct.pack_into("<4f", header, 280, *affine[0])
    struct.pack_into("<4f", header, 296, *affine[1])
    struct.pack_into("<4f", header, 312, *affine[2])
    blob = bytes(header) + data.tobytes(order="F")
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(blob)


@pytest.mark.parametrize("dtype_code,dtype", DTYPES)
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python_all_dtypes(tmp_path, dtype_code, dtype, gz):
    rng = np.random.RandomState(dtype_code)
    arr = (rng.randn(13, 11, 7) * 50).astype(dtype)
    path = str(tmp_path / ("t.nii" + (".gz" if gz else "")))
    write_nifti(path, arr, dtype_code, gz=gz)
    nat, _ = native.nifti_read(path)
    py, _ = read_nifti(path, prefer_native=False)
    assert nat.dtype == np.float32
    np.testing.assert_array_equal(nat, np.asarray(py, np.float64)
                                  .astype(np.float32))


@pytest.mark.parametrize("slope,inter", [(2.5, -3.0), (0.0, 7.0),
                                         (1.0, 99.0)])
def test_scl_scaling_rule(tmp_path, slope, inter):
    """Scaling applies iff slope not in {0, 1} — same rule both paths,
    float64 arithmetic before the float32 narrow."""
    rng = np.random.RandomState(1)
    arr = (rng.randn(9, 8, 5) * 40).astype(np.int16)
    path = str(tmp_path / "s.nii.gz")
    write_nifti(path, arr, 4, slope=slope, inter=inter, gz=True)
    nat, _ = native.nifti_read(path)
    py, _ = read_nifti(path, prefer_native=False)
    np.testing.assert_array_equal(nat, np.asarray(py, np.float64)
                                  .astype(np.float32))
    if slope in (0.0, 1.0):
        np.testing.assert_array_equal(nat, arr.astype(np.float32))


def test_4d_gap_affine_and_default_path(tmp_path):
    """4D volume, non-348+4 vox_offset gap, non-identity affine; also checks
    read_nifti's default (native-preferred) path returns the same values."""
    rng = np.random.RandomState(2)
    arr = rng.randn(20, 20, 12, 4).astype(np.float32)
    aff = np.array([[0., -1, 0, 5], [1, 0, 0, -3],
                    [0, 0, 2.5, 11], [0, 0, 0, 1]])
    path = str(tmp_path / "b.nii.gz")
    write_nifti(path, arr, 16, gz=True, affine=aff, vox_offset=500)
    nat, a_nat = native.nifti_read(path)
    np.testing.assert_array_equal(nat, arr)
    np.testing.assert_allclose(a_nat, aff, atol=1e-6)
    default, a_def = read_nifti(path)
    np.testing.assert_array_equal(default, arr)
    np.testing.assert_allclose(a_def, aff, atol=1e-6)


def test_fortran_order_layout(tmp_path):
    """Voxel stream is Fortran-ordered on disk; both readers must agree on
    a non-symmetric ramp."""
    arr = np.arange(3 * 4 * 5, dtype=np.float32).reshape(3, 4, 5)
    path = str(tmp_path / "f.nii")
    write_nifti(path, arr, 16)
    nat, _ = native.nifti_read(path)
    np.testing.assert_array_equal(nat, arr)
    assert nat[2, 0, 0] == 40.0 and nat[0, 1, 0] == 5.0


def test_bad_magic_falls_back(tmp_path):
    """A non-NIfTI file: native returns a header error and the public
    read_nifti surfaces the Python parser's ValueError."""
    path = str(tmp_path / "junk.nii")
    with open(path, "wb") as f:
        f.write(b"\x00" * 400)
    assert native.nifti_read(path) is None
    with pytest.raises(ValueError):
        read_nifti(path)


def test_truncated_stream_raises(tmp_path):
    rng = np.random.RandomState(3)
    arr = rng.randn(10, 10, 10).astype(np.float32)
    path = str(tmp_path / "t.nii")
    write_nifti(path, arr, 16)
    with open(path, "r+b") as f:
        f.truncate(352 + arr.nbytes // 2)
    with pytest.raises(OSError):
        native.nifti_read(path)
