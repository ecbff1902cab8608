"""SPMD-sharded k-space stylization: full volumes distributed over the mesh.

The reference sidesteps full-resolution BraTS volumes by cropping to
128x128x64 (``baseline.py:128-130``); SURVEY.md section 5 names spatial
sharding over the mesh as the TPU-native answer for the "big single sample"
case. This module runs the COMPLETE corruption stack of
:class:`~mvtb_tpu.ops.fused.StylizeConfig` on a volume whose H axis is
sharded across the ``data`` mesh axis:

1. local FFT over the unsharded axes (W, D),
2. ``all_to_all`` over ICI to trade the sharded axis (H gathers, W splits),
3. local FFT over the now-complete H axis,
4. k-space edits from *global* raw-coordinate index grids (iota + shard
   offset): radial masks and wrap parity as elementwise weights; spike /
   plane-wave writes as elementwise ``where`` on global-index match (no
   scatter, no gather); data-dependent spike stats via ``psum``,
5. inverse transforms mirroring 1-3; salt&pepper in the image domain with
   global extrema via ``pmin``/``pmax``.

Key-stream discipline: stages consume PRNG keys in exactly the order of the
single-chip :func:`~mvtb_tpu.ops.fused.stylize_kspace`, so EVERY draw is
identical to the single-chip path. Dense random fields (zero-fill,
salt&pepper) achieve this by global-coordinate construction: each shard
generates the full GLOBAL field from the stage key (threefry counters are a
pure function of (key, global shape), so the replicated compute is
bit-identical to the single-chip draw) and slices its own block. Zero-fill
additionally expands the single-chip rfft half-grid pair weight
``(b1 + b2)/2`` onto the full complex grid this path uses, each conjugate
pair carrying its half bin's weight (see :func:`_zf_weight_full` for why
pointwise-equal state — not just equal distribution — is required). The
replicated generation trades ~n_shards x redundant RNG compute (a few ms at
BraTS size) for exact parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvtb_tpu.ops.fused import (StylizeConfig, _gate, _resolve_backend,
                                _sample, _to_raw_index)
from mvtb_tpu.ops.fourier import from_polar
from mvtb_tpu.ops.masks import ellipsoid_shell_mask

Array = jnp.ndarray


def _local_transforms(cfg: StylizeConfig, spatial):
    """(fwd, inv, inv_real) local-block transform callables, each taking
    ``(array, axes)`` — resolved through the same backend logic as the
    single-chip path (``StylizeConfig.fft_backend``), so the matmul-DFT
    accelerator default applies to the per-shard transforms too. The
    ``xla`` fallback goes through :func:`mvtb_tpu.ops.dft._xla_fft_axes`,
    which transposes the requested axes innermost — the H-axis transform
    after the all_to_all trade is axis 1, and a direct ``jnp.fft`` there is
    UNIMPLEMENTED on the TPU backend (innermost axes only).
    """
    from mvtb_tpu.ops import dft as _dft

    backend = _resolve_backend(cfg.fft_backend, spatial)
    if backend in ("plane", "plane_fast", "dft_pallas"):
        # the fused plane kernel is a single-chip program (and the per-axis
        # Pallas kernels are a measured-slower template); per-shard local
        # transforms use the equivalent matmul-DFT tier
        backend = "dft_fast" if backend == "plane_fast" else "dft"
    if backend in ("dft", "dft_fast"):
        prec = (jax.lax.Precision.DEFAULT if backend == "dft_fast"
                else jax.lax.Precision.HIGHEST)
        return (lambda a, axes: _dft.dft_nd(a, axes, precision=prec),
                lambda a, axes: _dft.idft_nd(a, axes, precision=prec),
                lambda a, axes: _dft.idft_nd_real(a, axes, precision=prec))
    if backend == "hybrid":
        return (lambda a, axes: _dft.hybrid_dft_nd(a, axes),
                lambda a, axes: _dft.hybrid_idft_nd(a, axes),
                lambda a, axes: _dft.hybrid_idft_nd_real(a, axes))

    def _parts(a):
        if jnp.iscomplexobj(a):
            return a.real, a.imag
        # preserve double precision for x64 runs of the xla fallback (only
        # the matmul-DFT backends require the f32 cast); upcast low-precision
        # floats, which XLA FFT does not accept directly.
        if a.dtype == jnp.float64:
            return a, None
        return a.astype(jnp.float32), None

    def _fwd(a, axes):
        re, im = _dft._xla_fft_axes(*_parts(a), axes, inverse=False)
        return jax.lax.complex(re, im)

    def _inv(a, axes):
        re, im = _dft._xla_fft_axes(*_parts(a), axes, inverse=True)
        return jax.lax.complex(re, im)

    return (_fwd, _inv,
            lambda a, axes: _dft._xla_fft_axes(*_parts(a), axes,
                                               inverse=True)[0])


def _global_offset(n_global: int, start, local_shape, axis: int,
                   center_delta: float = 0.0) -> Array:
    """Offset-from-center grid (raw FFT coordinates) for a shard of an axis."""
    c = n_global // 2
    i = jax.lax.broadcasted_iota(jnp.float32, local_shape, axis) + start
    return jnp.where(i < n_global - c, i, i - n_global) - center_delta


def _global_index(n_global: int, start, local_shape, axis: int) -> Array:
    """Raw global integer index grid for a shard of an axis."""
    return jax.lax.broadcasted_iota(jnp.int32, local_shape, axis) + \
        jnp.asarray(start, jnp.int32)


def _zf_weight_full(key, C: int, spatial, zf_p: float, rdtype) -> Array:
    """Full-grid zero-fill weight matching the single-chip stream exactly.

    The single-chip rfft path (ops/fused.py zero-fill stage) draws two iid
    Bernoulli keep fields ``b1``/``b2`` on the HALF grid (last axis
    ``D//2 + 1``) and multiplies the half spectrum by the pair weight
    ``(b1 + b2)/2`` (``(b1 + b1m)/2`` on the self-mirrored last-axis slabs,
    ``b1m`` = the other-axes roll-flip mirror). This reproduces that field
    on the full grid — same draws, same key, same shapes (bit-identical
    threefry counters), each conjugate pair carrying its half bin's weight —
    so the sharded spectrum state equals the single-chip Hermitian state
    pointwise. That exactness matters beyond distribution: later spike/plane
    writes READ the spectrum at their points, so an iid per-point keep
    (right distribution, wrong pointwise state) would diverge at written
    points whenever the pair's two draws differ.
    """
    H, W, D = spatial
    Dh = D // 2 + 1
    u1 = jax.random.uniform(key, (C, H, W, Dh), rdtype)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (C, H, W, Dh), rdtype)
    b1 = (u1 > zf_p).astype(rdtype)
    b2 = (u2 > zf_p).astype(rdtype)
    b1m = b1
    for ax in (1, 2):  # roll-flip over the non-halved spatial axes (H, W)
        b1m = jnp.roll(jnp.flip(b1m, ax), 1, ax)
    d_half = jnp.arange(Dh)
    h_self = jnp.logical_or(d_half == 0, (D % 2 == 0) & (d_half == D // 2))
    w_half = jnp.where(h_self, (b1 + b1m) * 0.5, (b1 + b2) * 0.5)
    # expand to the full grid: lower-half d takes its own bin, upper-half d
    # takes its conjugate mirror's bin (-h, -w, D-d)
    d = jnp.arange(D)
    lower = d <= D // 2
    d_lo = jnp.where(lower, d, 0)
    d_up = jnp.where(lower, 0, D - d)
    mh = (-jnp.arange(H)) % H
    mw = (-jnp.arange(W)) % W
    w_low = jnp.take(w_half, d_lo, axis=-1)
    w_up = jnp.take(jnp.take(jnp.take(w_half, mh, axis=1), mw, axis=2),
                    d_up, axis=-1)
    return jnp.where(lower, w_low, w_up)


def stylize_kspace_sharded(x: Array, key: jax.Array, cfg: StylizeConfig,
                           mesh: Mesh, axis_name: str = "data") -> Array:
    """Fused corruption stack on one (C, H, W, D) volume sharded over H.

    All StylizeConfig stages are supported. The volume may be given
    unsharded (it is device_put to ``P(None, 'data')``); the result keeps
    that sharding. H and W must divide the mesh size.
    """
    if x.ndim != 4:
        raise ValueError("expected (C, H, W, D)")
    if cfg.n_dims != 3:
        raise ValueError("sharded path is 3D")
    n_shards = mesh.shape[axis_name]
    C, H, W, D = x.shape
    if H % n_shards or W % n_shards:
        raise ValueError(f"H={H} and W={W} must divide mesh size {n_shards}")
    rdtype = jnp.zeros((), x.dtype).real.dtype
    spatial = (H, W, D)
    fwd_t, inv_t, inv_real_t = _local_transforms(cfg, spatial)

    def local_fn(xl: Array, key) -> Array:
        idx = jax.lax.axis_index(axis_name)
        w_local = W // n_shards
        w0 = idx * w_local
        keys = jax.random.split(key, 16)
        kit = iter(keys)
        local_shape = (H, w_local, D)  # spatial block after the axis trade

        out = xl
        if cfg.kspace_needed:
            # 1) local FFT over (W, D); 2) trade H<->W; 3) FFT over H
            k = fwd_t(xl, (-2, -1))
            k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                                   tiled=True)
            k = fwd_t(k, (1,))

            def dist_sq(center_deltas):
                total = jnp.zeros(local_shape, jnp.float32)
                for ax, (n, start, delta) in enumerate(
                        zip(spatial, (0.0, w0, 0.0), center_deltas)):
                    o = _global_offset(n, start, local_shape, ax, delta)
                    total = total + o * o
                return total

            # ---- radial masks + wrap parity (same key order as fused) ----
            weight = None
            if cfg.gibbs_alpha is not None:
                deltas = tuple((n - 1) / 2 - n // 2 for n in spatial)
                dsq = dist_sq(deltas)
                alpha = _sample(next(kit), cfg.gibbs_alpha, rdtype)
                r = (1.0 - alpha) * max(spatial) * math.sqrt(2.0) / 2.0
                m = (dsq <= r * r).astype(rdtype)
                g = _gate(next(kit), cfg.gibbs_prob)
                weight = jnp.where(g, m, jnp.ones((), rdtype))
            if cfg.disk_r is not None:
                dsq = dist_sq((0.0,) * 3)
                r = _sample(next(kit), cfg.disk_r, rdtype)
                inside = dsq < r * r
                m = (jnp.logical_not(inside) if cfg.disk_inside_off
                     else inside).astype(rdtype)
                g = _gate(next(kit), cfg.disk_prob)
                m = jnp.where(g, m, jnp.ones((), rdtype))
                weight = m if weight is None else weight * m
            # wrap folds into the single multiply; written points get the
            # parity factor applied to their new value (reference order
            # Gibbs -> planes -> wrap; see ops/fused.py)
            wrap_alpha_val = None
            if cfg.wrap_alpha is not None:
                alpha = _sample(next(kit), cfg.wrap_alpha, rdtype)
                g = _gate(next(kit), cfg.wrap_prob)
                wrap_alpha_val = jnp.where(g, alpha, jnp.ones((), rdtype))
                for ax, (n, start) in enumerate(zip(spatial, (0, w0, 0))):
                    c = n // 2
                    i = _global_index(n, start, local_shape, ax)
                    s = jnp.where(i < n - c, i + c, i + c - n)
                    w = jnp.where(s % 2 == 1, wrap_alpha_val,
                                  jnp.ones((), rdtype))
                    weight = w if weight is None else weight * w
            if weight is not None:
                k = k * weight

            # ---- zero-fill (global-coordinate draws: replicated full-grid
            # generation, sliced to this shard's W block — bit-identical to
            # the single-chip rfft pair-weight stream) ----
            if cfg.zf_p is not None:
                w_zf = _zf_weight_full(next(kit), C, spatial, cfg.zf_p,
                                       rdtype)
                w_zf = jax.lax.dynamic_slice_in_dim(w_zf, w0, w_local, axis=2)
                g = _gate(next(kit), cfg.zf_prob)
                k = k * jnp.where(g, w_zf, jnp.ones((), rdtype))

            # ---- magnitude-domain edits ----
            # Written-point-only updates (as in ops/fused.py): each written
            # k-point gets magnitude exp(target) with its own phase, times
            # the wrap parity factor; everything else keeps k exactly — no
            # full-block log/angle/exp reconstruction.
            if cfg.spike or cfg.plane_axes is not None:
                hg = _global_index(H, 0, local_shape, 0)
                wg = _global_index(W, w0, local_shape, 1)
                dg = _global_index(D, 0, local_shape, 2)

                def wrap_at(shifted):
                    f = jnp.ones((), rdtype)
                    if wrap_alpha_val is None:
                        return f
                    for s in shifted:
                        f = f * jnp.where(s % 2 == 1, wrap_alpha_val,
                                          jnp.ones((), rdtype))
                    return f

                def point_update(kk, shifted, vals, gates):
                    """Set |k| to exp(vals) (keeping phase) at the per-channel
                    global point given by SHIFTED coords, where gated."""
                    raw = [_to_raw_index(shifted[d], spatial[d])
                           for d in range(3)]
                    pos = ((hg[None] == raw[0][:, None, None, None]) &
                           (wg[None] == raw[1][:, None, None, None]) &
                           (dg[None] == raw[2][:, None, None, None]))
                    write = pos & gates[:, None, None, None]
                    mag = jnp.exp(vals) * wrap_at(shifted)
                    # canonicalize signed zeros before taking the phase: a
                    # disk-masked point is (+-0.0 +- 0.0j) and angle(-0.0)
                    # is pi, which would flip the written wave's sign vs the
                    # single-chip path (whose sum-reduction yields +0.0)
                    kk_phase = jnp.where(kk == 0, jnp.zeros((), kk.dtype), kk)
                    new = from_polar(mag[:, None, None, None]
                                     .astype(rdtype), jnp.angle(kk_phase))
                    return jnp.where(write, new, kk)

                if cfg.spike:
                    if cfg.spike_range is None:
                        # global per-channel mean log-|k| via psum
                        local_sum = jnp.sum(jnp.log(jnp.abs(k) + 1e-10),
                                            axis=(-3, -2, -1))
                        total = jax.lax.psum(local_sum, axis_name)
                        means = total / (H * W * D)
                        lo, hi = means * 0.95, means * 1.10
                    else:
                        lo = jnp.full((C,), cfg.spike_range[0], rdtype)
                        hi = jnp.full((C,), cfg.spike_range[1], rdtype)
                    loc_keys = jax.random.split(next(kit), 3)
                    if cfg.spike_channel_wise:
                        shifted = [
                            jax.random.randint(loc_keys[d], (C,), 0, spatial[d])
                            for d in range(3)
                        ]
                        vals = lo + (hi - lo) * jax.random.uniform(
                            next(kit), (C,), rdtype)
                        gates = jax.random.bernoulli(next(kit),
                                                     cfg.spike_prob, (C,))
                    else:
                        shifted = [
                            jnp.full((C,), jax.random.randint(
                                loc_keys[d], (), 0, spatial[d]))
                            for d in range(3)
                        ]
                        u = jax.random.uniform(next(kit), (), rdtype)
                        vals = jnp.broadcast_to(lo + (hi - lo) * u, (C,))
                        gates = jnp.full((C,), _gate(next(kit), cfg.spike_prob))
                    k = point_update(k, shifted, vals, gates)

                if cfg.plane_axes is not None:
                    a, b, c3 = cfg.plane_axes
                    shell = jnp.asarray(
                        ellipsoid_shell_mask(spatial, a, b, c3).ravel())
                    logits = jnp.where(shell, 0.0, -jnp.inf)
                    flat = jax.random.categorical(next(kit), logits)
                    loc = jnp.unravel_index(flat, spatial)
                    g = _gate(next(kit), cfg.plane_prob)
                    k = point_update(
                        k, [jnp.full((C,), loc[d]) for d in range(3)],
                        jnp.full((C,), cfg.plane_intensity, rdtype),
                        jnp.full((C,), g))

            # ---- inverse: H, trade back, (W, D) ----
            k = inv_t(k, (1,))
            k = jax.lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2,
                                   tiled=True)
            out = inv_real_t(k, (-2, -1)).astype(x.dtype)

        # ---- salt & pepper with global extrema (u drawn on the GLOBAL
        # shape and sliced to this shard's H block: same threefry counters
        # as the single-chip draw, so the impulse pattern matches exactly) ----
        if cfg.sap_p is not None:
            p = _sample(next(kit), cfg.sap_p, rdtype)
            g = _gate(next(kit), cfg.sap_prob)
            p = jnp.where(g, p, jnp.zeros((), rdtype))
            h_local = H // n_shards
            u = jax.random.uniform(next(kit), (C, H, W, D), rdtype)
            u = jax.lax.dynamic_slice_in_dim(u, idx * h_local, h_local,
                                             axis=1)
            lo = jax.lax.pmin(out.min(), axis_name) / 2
            hi = jax.lax.pmax(out.max(), axis_name) / 2
            styled = jnp.where(u <= p / 2, lo, out)
            out = jnp.where((u > p / 2) & (u <= p), hi, styled)

        return out

    sharding = NamedSharding(mesh, P(None, axis_name))
    x = jax.device_put(x, sharding)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, axis_name), P()),
                   out_specs=P(None, axis_name))
    return jax.jit(fn)(x, key)
