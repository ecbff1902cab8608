"""Native (C++) host-side components, ctypes-bound with graceful fallback.

The reference is pure Python (SURVEY.md section 2.5) so nothing here is a
port; these exist because the 1-core host in this deployment must keep a TPU
fed. Currently: the trilinear/nearest resampler behind
``mvtb_tpu.data.preprocess.resample_to_spacing`` and the one-pass NIfTI-1
decoder (gzip inflate fused with dtype conversion) behind
``mvtb_tpu.data.nifti.read_nifti``.

The shared library is built on demand with g++ (one-time, cached next to
the source as ``libmvtbnative.so``); every entry point falls back to the
pure-Python/scipy implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "resample.cpp"), os.path.join(_DIR, "nifti.cpp")]
_LIB = os.path.join(_DIR, "libmvtbnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or any(
                os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.nifti_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
        lib.nifti_read_header.restype = ctypes.c_int
        lib.nifti_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.nifti_read_f32.restype = ctypes.c_int
        lib.resample3d_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),                 # in
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),                # 3x4 map
            ctypes.POINTER(ctypes.c_float),                 # out
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,                                   # order
        ]
        lib.resample3d_f32.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is (or can be) loaded."""
    return _load() is not None


def resample3d(volume: np.ndarray, matrix: np.ndarray, out_shape,
               order: int) -> Optional[np.ndarray]:
    """Native channel-first 3D resample; None when the library is absent.

    ``matrix`` is the 3x4 output-voxel -> input-voxel affine map;
    semantics match ``scipy.ndimage.map_coordinates(order, mode='nearest')``
    with float64 interpolation arithmetic.
    """
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, np.float32)
    m = np.ascontiguousarray(matrix, np.float64).reshape(12)
    out = np.empty((vol.shape[0],) + tuple(int(n) for n in out_shape),
                   np.float32)
    lib.resample3d_f32(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.shape[0], vol.shape[1], vol.shape[2], vol.shape[3],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[1], out.shape[2], out.shape[3],
        int(order),
    )
    return out


def nifti_read(path: str):
    """Native NIfTI-1 read -> (float32 Fortran-order array, 4x4 affine),
    or None when the library is absent / the file needs the Python path
    (big-endian, exotic dtype, NIfTI-2).

    One fused pass: gzip inflate -> dtype convert -> scl scaling, straight
    into the result buffer. Semantics match
    ``mvtb_tpu.data.nifti.read_nifti`` (reference ingest:
    ``source_code/baseline.py:116-130`` via nibabel/MONAI), except the
    result dtype is always float32.
    """
    lib = _load()
    if lib is None:
        return None
    hdr = np.zeros(24, np.float64)
    rc = lib.nifti_read_header(
        path.encode(), hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        if rc in (-3, -4):  # not LE NIfTI-1 / unsupported dtype
            return None
        raise OSError(f"native NIfTI header parse failed for {path} ({rc})")
    ndim = int(hdr[0])
    shape = tuple(int(d) for d in hdr[1:1 + ndim])
    n = int(np.prod(shape))
    flat = np.empty(n, np.float32)
    rc = lib.nifti_read_f32(
        path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n))
    if rc != 0:
        raise OSError(f"native NIfTI decode failed for {path} ({rc})")
    data = flat.reshape(shape, order="F")
    affine = np.eye(4)
    affine[:3, :] = hdr[12:24].reshape(3, 4)
    if not np.isfinite(affine).all() or np.allclose(affine[:3, :3], 0):
        affine = np.eye(4)
    return data, affine
