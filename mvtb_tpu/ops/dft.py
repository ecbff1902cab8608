"""DFT-by-matmul: route Fourier transforms onto the MXU.

BraTS spatial sizes (240, 240, 155) are not powers of two; XLA's TPU FFT
falls back to expensive mixed-radix/Bluestein paths on the VPU. A direct DFT
along one axis is a matmul with the n x n DFT matrix — exactly what the MXU
is built for. Total work for a 3D transform is sum_axis(n_axis) complex MACs
per voxel (635 for BraTS vs ~log-scale for FFT), but at MXU throughput this
wins by a wide margin for n up to a few thousand.

``dft_nd(x, axes)`` / ``idft_nd`` are drop-in (unshifted) replacements for
``jnp.fft.fftn`` / ``ifftn`` over trailing axes; ``rdft_nd`` / ``irdft_nd_real``
mirror ``rfftn`` / ``irfftn`` on the half spectrum (0.44x the MACs at BraTS
size). Complex arithmetic is expressed as real matmuls so the MXU sees plain
GEMMs — complex-input axes use Gauss's 3-matmul trick (25% fewer MACs than
the naive 4; see ``_gauss_dft_matrices_np``). Every function takes a
``precision``: the default ``HIGHEST`` keeps ~1e-6 relative accuracy;
``DEFAULT`` drops to single-pass bf16 inputs with f32 accumulation (~1e-2
relative — the ``StylizeConfig.fft_backend="dft_fast"`` augmentation mode;
measured numbers in BENCHMARKS.md).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Axis lengths up to this bound use the matmul DFT; above it, XLA's FFT.
MATMUL_DFT_MAX_N = 4096


def _dft_matrix_f64(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) parts of the (i)DFT matrix in float64.

    Forward: W[j, k] = exp(-2i pi j k / n); inverse: conj / n.
    """
    jk = np.outer(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64))
    theta = 2.0 * np.pi * (jk % n) / n  # reduce before cos/sin for accuracy
    sign = 1.0 if inverse else -1.0
    cos = np.cos(theta)
    sin = sign * np.sin(theta)
    if inverse:
        cos /= n
        sin /= n
    return cos, sin


@lru_cache(maxsize=64)
def _dft_matrix_np(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """float32 (cos, sin) parts of the (i)DFT matrix, computed in float64."""
    cos, sin = _dft_matrix_f64(n, inverse)
    return cos.astype(np.float32), sin.astype(np.float32)


@lru_cache(maxsize=64)
def _gauss_dft_matrices_np(
        n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cos, sin-cos, cos+sin) for the 3-matmul complex contraction.

    Gauss's complex-multiplication trick applied at the matrix level: for
    X = re + i*im and W = cos + i*sin,
        k1 = (re + im) @ cos
        k2 = re @ (sin - cos)
        k3 = im @ (cos + sin)
        Re(XW) = k1 - k3,  Im(XW) = k1 + k2
    — three real MXU matmuls instead of four (25% of the MACs saved on every
    complex-input axis). The combined matrices are formed in float64 so the
    cancellation in (sin - cos) costs no accuracy.
    """
    cos, sin = _dft_matrix_f64(n, inverse)
    return (cos.astype(np.float32),
            (sin - cos).astype(np.float32),
            (cos + sin).astype(np.float32))


def _mm(a: Array, b: Array, precision) -> Array:
    """Contract ``a``'s last axis with ``b``'s first on the MXU.

    ``precision`` selects the TPU matmul pass structure: ``HIGHEST`` is
    f32-accurate (the parity default), ``DEFAULT`` is a single bf16 pass —
    ~8x the MXU throughput at ~1e-2 relative error (measured; see
    BENCHMARKS.md). Accumulation is always f32.
    """
    if precision in (jax.lax.Precision.DEFAULT, "default"):
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)


def _axis_dft(re: Array, im: Optional[Array], axis: int, inverse: bool,
              precision=jax.lax.Precision.HIGHEST) -> Tuple[Array, Array]:
    """Apply a 1-axis DFT via two (real input) or three (complex input —
    Gauss's trick, see :func:`_gauss_dft_matrices_np`) real matmuls."""
    n = re.shape[axis]
    re_m = jnp.moveaxis(re, axis, -1)

    def mm(a, b):
        return _mm(a, jnp.asarray(b), precision)

    if im is None:  # real input: (re + 0i) @ (cos + i sin)
        cos, sin = _dft_matrix_np(n, inverse)
        out_re = mm(re_m, cos)
        out_im = mm(re_m, sin)
    else:
        cos, sin_m_cos, cos_p_sin = _gauss_dft_matrices_np(n, inverse)
        im_m = jnp.moveaxis(im, axis, -1)
        k1 = mm(re_m + im_m, cos)
        out_re = k1 - mm(im_m, cos_p_sin)
        out_im = k1 + mm(re_m, sin_m_cos)
    return jnp.moveaxis(out_re, -1, axis), jnp.moveaxis(out_im, -1, axis)


def dft_nd(x: Array, axes: Sequence[int],
           precision=jax.lax.Precision.HIGHEST) -> Array:
    """Forward n-D DFT over ``axes`` (unshifted), matmul-backed.

    Accepts real or complex input; returns complex64 — same contract as
    ``jnp.fft.fftn(x, axes=axes)``.
    """
    axes = [a % x.ndim for a in axes]
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    for axis in axes:
        re, im = _axis_dft(re, im, axis, inverse=False, precision=precision)
    return jax.lax.complex(re, im)


def idft_nd(x: Array, axes: Sequence[int],
            precision=jax.lax.Precision.HIGHEST) -> Array:
    """Inverse n-D DFT over ``axes`` (norm='backward'), matmul-backed."""
    axes = [a % x.ndim for a in axes]
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    for axis in axes:
        re, im = _axis_dft(re, im, axis, inverse=True, precision=precision)
    return jax.lax.complex(re, im)


def idft_nd_real(x: Array, axes: Sequence[int],
                 precision=jax.lax.Precision.HIGHEST) -> Array:
    """Inverse n-D DFT keeping only the real part.

    Skips computing the imaginary output of the *last* axis transform
    entirely — that axis costs 2 matmuls instead of the Gauss complex
    contraction's 3 (it was a 25% saving when complex axes cost 4).
    """
    axes = [a % x.ndim for a in axes]
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    for axis in axes[:-1]:
        re, im = _axis_dft(re, im, axis, inverse=True, precision=precision)

    axis = axes[-1]
    n = re.shape[axis]
    cos, sin = _dft_matrix_np(n, inverse=True)
    cos = jnp.asarray(cos)
    sin = jnp.asarray(sin)
    re_m = jnp.moveaxis(re, axis, -1)

    out = _mm(re_m, cos, precision)
    if im is not None:
        im_m = jnp.moveaxis(im, axis, -1)
        out = out - _mm(im_m, sin, precision)
    return jnp.moveaxis(out, -1, axis)


@lru_cache(maxsize=64)
def _half_dft_matrix_np(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of the forward half-spectrum DFT matrix, shape (n, n//2+1).

    ``K[k] = sum_j x[j] exp(-2i pi j k / n)`` for ``k in [0, n//2]`` — the
    rfft contract on the last axis.
    """
    h = n // 2 + 1
    jk = np.outer(np.arange(n, dtype=np.float64), np.arange(h, dtype=np.float64))
    theta = 2.0 * np.pi * (jk % n) / n
    return np.cos(theta).astype(np.float32), (-np.sin(theta)).astype(np.float32)


@lru_cache(maxsize=64)
def _half_idft_matrix_np(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cosT, sinT) of the real-output inverse half-spectrum DFT, (n//2+1, n).

    For Hermitian completion ``K`` of the half spectrum ``H``:
    ``y[j] = (1/n) sum_k K[k] e^{+2i pi jk/n}
           = sum_{k<h} (c_k/n) (H_re[k] cos - H_im[k] sin)`` with pair weight
    ``c_k = 2`` except on the self-mirrored bins (k=0 and, for even n, n/2).
    The ``c_k/n`` factor is folded into the matrices.
    """
    h = n // 2 + 1
    kj = np.outer(np.arange(h, dtype=np.float64), np.arange(n, dtype=np.float64))
    theta = 2.0 * np.pi * (kj % n) / n
    c = np.full((h, 1), 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[-1] = 1.0
    c /= n
    return ((np.cos(theta) * c).astype(np.float32),
            (np.sin(theta) * c).astype(np.float32))


def rdft_nd(x: Array, axes: Sequence[int],
            precision=jax.lax.Precision.HIGHEST) -> Array:
    """Real-input n-D DFT producing the half spectrum on the LAST axis of
    ``axes`` — the ``jnp.fft.rfftn(x, axes=axes)`` contract, matmul-backed.

    The last-axis transform is a real (2-matmul) contraction against the
    (n, n//2+1) half matrix; the remaining axes are full complex DFTs over
    the half-size grid — 0.44x the MACs of the full complex transform at
    BraTS size.
    """
    axes = [a % x.ndim for a in axes]
    k = half_dft_axis(x, axes[-1], precision)
    re, im = k.real, k.imag
    for axis in axes[:-1]:
        re, im = _axis_dft(re, im, axis, inverse=False, precision=precision)
    return jax.lax.complex(re, im)


def irdft_nd_real(x: Array, s: Sequence[int], axes: Sequence[int],
                  precision=jax.lax.Precision.HIGHEST) -> Array:
    """Inverse of :func:`rdft_nd`: Hermitian half spectrum -> real volume —
    the ``jnp.fft.irfftn(x, s=s, axes=axes)`` contract, matmul-backed.

    Full complex inverse DFTs on the leading axes, then one 2-matmul
    real-output contraction against the (n//2+1, n) completion matrix (the
    conjugate-pair weight and 1/n are folded into the matrix).
    """
    axes = [a % x.ndim for a in axes]
    re, im = x.real, x.imag
    for axis in axes[:-1]:
        re, im = _axis_dft(re, im, axis, inverse=True, precision=precision)
    return half_idft_axis_real(jax.lax.complex(re, im), int(s[-1]),
                               axes[-1], precision)


def half_dft_axis(x: Array, axis: int,
                  precision=jax.lax.Precision.HIGHEST) -> Array:
    """Real-input half-spectrum DFT over ONE arbitrary axis.

    Same contract as ``jnp.fft.rfft(x, axis=axis)``. Used by the fused
    plane-kernel path (ops/fused_plane.py), which keeps its half spectrum on
    the H axis so the (W, D) plane stays in the trailing — contiguous —
    dimensions for the Pallas kernel's DMA.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    cos, sin = _half_dft_matrix_np(n)
    x_m = jnp.moveaxis(x.astype(jnp.float32), axis, -1)
    re = jnp.moveaxis(_mm(x_m, jnp.asarray(cos), precision), -1, axis)
    im = jnp.moveaxis(_mm(x_m, jnp.asarray(sin), precision), -1, axis)
    return jax.lax.complex(re, im)


def half_idft_axis_real(x: Array, n: int, axis: int,
                        precision=jax.lax.Precision.HIGHEST) -> Array:
    """Hermitian half spectrum on ONE axis -> real volume (the
    ``jnp.fft.irfft(x, n=n, axis=axis)`` contract)."""
    axis = axis % x.ndim
    cosT, sinT = _half_idft_matrix_np(n)
    re_m = jnp.moveaxis(x.real, axis, -1)
    im_m = jnp.moveaxis(x.imag, axis, -1)
    out = (_mm(re_m, jnp.asarray(cosT), precision)
           - _mm(im_m, jnp.asarray(sinT), precision))
    return jnp.moveaxis(out, -1, axis)


def use_matmul_dft(spatial: Sequence[int]) -> bool:
    """Heuristic: matmul DFT for every axis within the MXU-friendly bound."""
    return all(n <= MATMUL_DFT_MAX_N for n in spatial)


# ---------------------------------------------------------------------------
# Hybrid per-axis backend: XLA FFT for 2/3/5-smooth axis lengths, matmul-DFT
# for the rest. Measured on the BraTS grid (240, 240, 155): 240 = 2^4*3*5 is
# FFT-friendly (XLA fft2 over the innermost 240x240 plane beats the naive
# 4-matmul pair), while 155 = 5*31 falls into Bluestein territory (XLA rfft
# 8.5 ms vs ~1.3 ms for the half matmul). XLA's TPU FFT only operates on
# innermost axes, so smooth axes are transposed innermost and back — the
# transpose cost is included in the measurement. NOTE: once complex axes
# gained Gauss's 3-matmul contraction, the all-matmul backend overtook the
# hybrid even on fully smooth shapes (BENCHMARKS.md config 8), so "auto"
# now resolves to "dft"; the hybrid stays as the measured alternative.
# ---------------------------------------------------------------------------


def _smooth235(n: int) -> bool:
    """True when ``n`` factors entirely into 2/3/5 (XLA FFT fast radixes)."""
    if n <= 0:
        return False  # 0 % p == 0 forever — a zero-length axis must not spin
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


def _xla_fft_axes(re: Array, im: Optional[Array], axes: Sequence[int],
                  inverse: bool) -> Tuple[Array, Array]:
    """Complex (i)FFT over ``axes`` via XLA, transposing them innermost."""
    nd = re.ndim
    axes = sorted(a % nd for a in axes)
    rest = [d for d in range(nd) if d not in axes]
    perm = rest + axes
    k = jax.lax.complex(re, jnp.zeros_like(re) if im is None else im)
    k = jnp.transpose(k, perm)
    f = jnp.fft.ifftn if inverse else jnp.fft.fftn
    k = f(k, axes=tuple(range(nd - len(axes), nd)))
    k = jnp.transpose(k, np.argsort(perm))
    return k.real, k.imag


def _split_smooth(x: Array, axes: Sequence[int]):
    smooth = [a for a in axes if _smooth235(x.shape[a])]
    mat = [a for a in axes if not _smooth235(x.shape[a])]
    return smooth, mat


def hybrid_rdft_nd(x: Array, axes: Sequence[int],
                   precision=jax.lax.Precision.HIGHEST) -> Array:
    """``jnp.fft.rfftn`` contract with the per-axis hybrid backend."""
    axes = [a % x.ndim for a in axes]
    last = axes[-1]
    n_last = x.shape[last]
    smooth_lead, mat_lead = _split_smooth(x, axes[:-1])

    if _smooth235(n_last):
        if not mat_lead:  # fully FFT-friendly: one native HLO, no transposes
            return jnp.fft.rfftn(x, axes=axes)
        xm = jnp.moveaxis(x, last, -1)
        k = jnp.moveaxis(jnp.fft.rfft(xm, axis=-1), -1, last)
        re, im = k.real, k.imag
    else:
        cos, sin = _half_dft_matrix_np(n_last)
        x_m = jnp.moveaxis(x.astype(jnp.float32), last, -1)
        re = jnp.moveaxis(_mm(x_m, jnp.asarray(cos), precision), -1, last)
        im = jnp.moveaxis(_mm(x_m, jnp.asarray(sin), precision), -1, last)

    for a in mat_lead:
        re, im = _axis_dft(re, im, a, inverse=False, precision=precision)
    if smooth_lead:
        re, im = _xla_fft_axes(re, im, smooth_lead, inverse=False)
    return jax.lax.complex(re, im)


def hybrid_irdft_nd_real(x: Array, s: Sequence[int], axes: Sequence[int],
                         precision=jax.lax.Precision.HIGHEST) -> Array:
    """``jnp.fft.irfftn`` contract with the per-axis hybrid backend."""
    axes = [a % x.ndim for a in axes]
    last = axes[-1]
    n = int(s[-1])
    smooth_lead, mat_lead = _split_smooth(x, axes[:-1])

    if _smooth235(n) and not mat_lead:
        return jnp.fft.irfftn(x, s=tuple(s), axes=axes)

    re, im = x.real, x.imag
    if smooth_lead:
        re, im = _xla_fft_axes(re, im, smooth_lead, inverse=True)
    for a in mat_lead:
        re, im = _axis_dft(re, im, a, inverse=True, precision=precision)

    if _smooth235(n):
        km = jnp.moveaxis(jax.lax.complex(re, im), last, -1)
        return jnp.moveaxis(jnp.fft.irfft(km, n=n, axis=-1), -1, last)
    cosT, sinT = _half_idft_matrix_np(n)
    re_m = jnp.moveaxis(re, last, -1)
    im_m = jnp.moveaxis(im, last, -1)
    out = (_mm(re_m, jnp.asarray(cosT), precision)
           - _mm(im_m, jnp.asarray(sinT), precision))
    return jnp.moveaxis(out, -1, last)


def hybrid_dft_nd(x: Array, axes: Sequence[int],
                  precision=jax.lax.Precision.HIGHEST) -> Array:
    """``jnp.fft.fftn`` contract with the per-axis hybrid backend."""
    axes = [a % x.ndim for a in axes]
    smooth, mat = _split_smooth(x, axes)
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    for a in mat:
        re, im = _axis_dft(re, im, a, inverse=False, precision=precision)
    if smooth:
        re, im = _xla_fft_axes(re, im, smooth, inverse=False)
    return jax.lax.complex(re, im)


def hybrid_idft_nd(x: Array, axes: Sequence[int],
                   precision=jax.lax.Precision.HIGHEST) -> Array:
    """Inverse n-D DFT (complex output, norm='backward') with the per-axis
    hybrid backend — the ``jnp.fft.ifftn(x, axes=axes)`` contract."""
    axes = [a % x.ndim for a in axes]
    smooth, mat = _split_smooth(x, axes)
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    if smooth:
        re, im = _xla_fft_axes(re, im, smooth, inverse=True)
    for a in mat:
        re, im = _axis_dft(re, im, a, inverse=True, precision=precision)
    if im is None:
        im = jnp.zeros_like(re)
    return jax.lax.complex(re, im)


def hybrid_idft_nd_real(x: Array, axes: Sequence[int],
                        precision=jax.lax.Precision.HIGHEST) -> Array:
    """Inverse n-D DFT (real part only) with the per-axis hybrid backend.

    When at least one axis is matmul-backed, its inverse runs last so the
    imaginary output of the final contraction is never computed (the same
    2-instead-of-3-matmul saving as :func:`idft_nd_real`).
    """
    axes = [a % x.ndim for a in axes]
    smooth, mat = _split_smooth(x, axes)
    if jnp.iscomplexobj(x):
        re, im = x.real, x.imag
    else:
        re, im = x.astype(jnp.float32), None
    if smooth:
        re, im = _xla_fft_axes(re, im, smooth, inverse=True)
    if not mat:
        return re
    for a in mat[:-1]:
        re, im = _axis_dft(re, im, a, inverse=True, precision=precision)
    axis = mat[-1]
    n = re.shape[axis]
    cos, sin = _dft_matrix_np(n, inverse=True)
    re_m = jnp.moveaxis(re, axis, -1)
    out = _mm(re_m, jnp.asarray(cos), precision)
    if im is not None:
        im_m = jnp.moveaxis(im, axis, -1)
        out = out - _mm(im_m, jnp.asarray(sin), precision)
    return jnp.moveaxis(out, -1, axis)
