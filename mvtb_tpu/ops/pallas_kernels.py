"""Pallas TPU kernels for the image-domain hot ops.

Salt-and-pepper is the one stage of the corruption stack with a large
random field: the XLA path materializes a full uniform volume
(``jax.random.uniform`` -> HBM) and reads it back for the two selects. The
Pallas kernel generates the random bits **inside** the kernel with the
per-core PRNG (``pltpu.prng_random_bits``) while streaming the volume
through VMEM once — one HBM read + one write total, no random field ever
touching HBM.

The global min/max the op needs (reference semantics: extrema over the whole
tensor, FO:476) are reduced on the host side of the op via one fused XLA
reduction; the kernel takes them as SMEM scalars.

Measured on TPU v5e (240x240x155x4 volume, device-loop timing): this kernel
runs at 2.05 ms/vol vs 0.77 ms/vol for the XLA path — XLA's threefry +
selects already fuse into a single HBM pass, and the kernel pays an extra
pad/copy for lane alignment. The fused stylization path therefore keeps the
XLA implementation; this kernel stays as the measured alternative and the
template for future k-space Pallas work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LANES = 128
_SUBLANES = 8
_BLOCK_ROWS = 512  # rows of 128 lanes per grid step (256 KB f32 per buffer)


def _sap_kernel(seed_ref, p_ref, lo_ref, hi_ref, x_ref, o_ref):
    """One grid step: salt-and-pepper over a (BLOCK_ROWS, 128) tile."""
    # distinct stream per grid step: seed with (user_seed, program_id)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    # uniform in [0, 1): top 24 bits, bitcast to int32 (fits: < 2^24) since
    # Mosaic lacks a uint32->f32 cast, then scaled by 2^-24
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    p = p_ref[0]
    x = x_ref[:]
    out = jnp.where(u <= p * 0.5, lo_ref[0], x)
    o_ref[:] = jnp.where(jnp.logical_and(u > p * 0.5, u <= p), hi_ref[0], out)


def _polar_kernel(re_ref, im_ref, ore_ref, oim_ref):
    """One grid step: magnitude-phase decompose + recombine on a tile.

    The faithful reference chain (``KSpaceSpikeNoise``, FO:906-945):
    ``exp(log(|k| + 1e-10)) * (cos(angle k), sin(angle k))``, fused into a
    single VMEM pass (two reads, two writes) instead of XLA's materialized
    log-magnitude and phase intermediates. ``cos/sin(angle k)`` are computed
    directly as ``re/|k|, im/|k|`` (identical by definition, with atan2's
    zero convention ``cos=1, sin=0`` at the origin) — Mosaic has no atan2
    lowering, and the division form is cheaper anyway.
    """
    re = re_ref[:]
    im = im_ref[:]
    r = jnp.sqrt(re * re + im * im)
    mag = jnp.exp(jnp.log(r + 1e-10))
    safe = jnp.where(r > 0, r, 1.0)
    ore_ref[:] = mag * jnp.where(r > 0, re / safe, 1.0)
    oim_ref[:] = mag * jnp.where(r > 0, im / safe, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def polar_roundtrip_pallas(re: Array, im: Array, interpret: bool = False):
    """Full-volume polar decompose/recombine in one fused pass.

    Round-2 measurement target (VERDICT #4): the round-1 fused path spent a
    ~2 ms/volume elementwise tail on this chain around the k-point writes.
    The production path now edits only the written points (gather/scatter in
    ops/fused.py) so no full-volume chain remains; this kernel is the
    measured alternative for workloads that DO need the whole polar volume
    (e.g. log-magnitude displays, future magnitude-space filters). See
    BENCHMARKS.md for the numbers vs the unfused XLA chain.
    """
    orig_shape = re.shape
    n = re.size
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    pad = rows_padded * _LANES - n

    def prep(a):
        return jnp.pad(a.reshape(-1), (0, pad)).reshape(rows_padded, _LANES)

    grid = rows_padded // _BLOCK_ROWS
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        _polar_kernel,
        grid=(grid,),
        in_specs=[block, block],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct((rows_padded, _LANES), re.dtype),
                   jax.ShapeDtypeStruct((rows_padded, _LANES), im.dtype)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(prep(re), prep(im))
    return (out_re.reshape(-1)[:n].reshape(orig_shape),
            out_im.reshape(-1)[:n].reshape(orig_shape))


@partial(jax.jit, static_argnames=("interpret",))
def salt_and_pepper_pallas(x: Array, p, seed, interpret: bool = False) -> Array:
    """Salt-and-pepper with on-chip PRNG (semantics of FO:465-482).

    The uniform field never exists in HBM. ``seed`` is an int32 scalar (vary
    per call for fresh noise). Matches the distribution of
    :func:`mvtb_tpu.ops.salt_and_pepper` (different stream — Pallas PRNG vs
    threefry), with identical pepper/salt levels ``min(x)/2`` / ``max(x)/2``.
    """
    orig_shape = x.shape
    n = x.size
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    pad = rows_padded * _LANES - n

    lo = (x.min() / 2).astype(x.dtype)
    hi = (x.max() / 2).astype(x.dtype)

    flat = jnp.pad(x.reshape(-1), (0, pad)).reshape(rows_padded, _LANES)
    grid = rows_padded // _BLOCK_ROWS

    out = pl.pallas_call(
        _sap_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_padded, _LANES), x.dtype),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([p], x.dtype),
        jnp.asarray([lo], x.dtype),
        jnp.asarray([hi], x.dtype),
        flat,
    )
    return out.reshape(-1)[:n].reshape(orig_shape)
