"""SPMD-sharded k-space filtering: full volumes distributed over the mesh.

The reference sidesteps full-resolution BraTS volumes by cropping to
128x128x64 (``baseline.py:128-130``); SURVEY.md section 5 names spatial
sharding over the mesh as the TPU-native answer for the "big single sample"
case. This module processes a volume whose H axis is sharded across the
``data`` mesh axis:

1. local FFT over the unsharded axes (W, D),
2. ``all_to_all`` over ICI to trade the sharded axis (H gathers, W splits),
3. local FFT over the now-complete H axis,
4. the k-space weight (Gibbs/disk radial mask x wraparound parity) applied
   per shard from *global* raw-coordinate index grids (iota + shard offset,
   still nothing materialized in HBM),
5. inverse transforms mirroring 1-3.

Everything happens inside one ``shard_map``-ed jitted program; the only
cross-chip traffic is the two all_to_alls riding ICI.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mvtb_tpu.ops.fused import StylizeConfig, _sample, _gate

Array = jnp.ndarray


def _raw_offset_local(n_global: int, n_local: int, start: Array, spatial,
                      axis: int) -> Array:
    """Raw-coordinate offset grid for a *shard* of a global axis.

    Global raw index i in [start, start+n_local); offset-from-center is
    ``i`` for i < n - floor(n/2) else ``i - n`` (see ops.fused._raw_offset).
    """
    c = n_global // 2
    i = jax.lax.broadcasted_iota(jnp.float32, spatial, axis) + start
    return jnp.where(i < n_global - c, i, i - n_global)


def _kspace_weight_local(cfg: StylizeConfig, key, global_shape, local_shape,
                         shard_starts, rdtype):
    """Per-shard multiplicative k-space weight from global indices.

    Supports the linear-mask stages (gibbs / disk / wrap); magnitude-domain
    stages (spikes, plane waves) stay on the single-chip path.
    """
    nd = len(global_shape)
    keys = jax.random.split(key, 8)
    kit = iter(keys)
    weight = None

    def offs(center_deltas):
        total = jnp.zeros(local_shape, jnp.float32)
        for ax in range(nd):
            o = _raw_offset_local(global_shape[ax], local_shape[ax],
                                  shard_starts[ax], local_shape, ax)
            o = o - center_deltas[ax]
            total = total + o * o
        return total

    if cfg.gibbs_alpha is not None:
        deltas = tuple((n - 1) / 2 - n // 2 for n in global_shape)
        dist_sq = offs(deltas)
        alpha = _sample(next(kit), cfg.gibbs_alpha, rdtype)
        r = (1.0 - alpha) * max(global_shape) * math.sqrt(2.0) / 2.0
        m = (dist_sq <= r * r).astype(rdtype)
        g = _gate(next(kit), cfg.gibbs_prob)
        weight = jnp.where(g, m, jnp.ones((), rdtype))
    if cfg.disk_r is not None:
        dist_sq = offs((0.0,) * nd)
        r = _sample(next(kit), cfg.disk_r, rdtype)
        inside = dist_sq < r * r
        m = (jnp.logical_not(inside) if cfg.disk_inside_off else inside).astype(rdtype)
        g = _gate(next(kit), cfg.disk_prob)
        m = jnp.where(g, m, jnp.ones((), rdtype))
        weight = m if weight is None else weight * m
    if cfg.wrap_alpha is not None:
        alpha = _sample(next(kit), cfg.wrap_alpha, rdtype)
        g = _gate(next(kit), cfg.wrap_prob)
        alpha = jnp.where(g, alpha, jnp.ones((), rdtype))
        for ax in range(nd):
            n = global_shape[ax]
            c = n // 2
            i = jax.lax.broadcasted_iota(jnp.int32, local_shape, ax) + \
                shard_starts[ax].astype(jnp.int32)
            s = jnp.where(i < n - c, i + c, i + c - n)
            w = jnp.where(s % 2 == 1, alpha, jnp.ones((), rdtype))
            weight = w if weight is None else weight * w
    return weight


def stylize_kspace_sharded(x: Array, key: jax.Array, cfg: StylizeConfig,
                           mesh: Mesh, axis_name: str = "data") -> Array:
    """Fused k-space filtering of one (C, H, W, D) volume sharded over H.

    Supports the radial-mask + wraparound stages of ``cfg`` (3D). The volume
    may be given unsharded (it is device_put to ``P(None, 'data')``); the
    result has the same sharding. H and W must both divide the mesh size.
    """
    if cfg.spike or cfg.plane_axes is not None or cfg.zf_p is not None \
            or cfg.sap_p is not None:
        raise NotImplementedError(
            "sharded path supports gibbs/disk/wrap stages; use the "
            "single-chip stylize_kspace for magnitude-domain stages")
    if x.ndim != 4:
        raise ValueError("expected (C, H, W, D)")
    n_shards = mesh.shape[axis_name]
    C, H, W, D = x.shape
    if H % n_shards or W % n_shards:
        raise ValueError(f"H={H} and W={W} must divide mesh size {n_shards}")
    rdtype = jnp.zeros((), x.dtype).real.dtype

    def local_fn(xl: Array, key) -> Array:
        idx = jax.lax.axis_index(axis_name)
        w_local = W // n_shards

        # 1) local FFT over (W, D)
        k = jnp.fft.fftn(xl, axes=(-2, -1))
        # 2) all_to_all: gather H, split W  -> (C, H, W/n, D)
        k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)
        # 3) local FFT over H
        k = jnp.fft.fft(k, axis=1)

        # 4) per-shard weight from global indices (W is the sharded axis now)
        shard_starts = (jnp.float32(0.0),
                        (idx * w_local).astype(jnp.float32),
                        jnp.float32(0.0))
        weight = _kspace_weight_local(cfg, key, (H, W, D), (H, w_local, D),
                                      shard_starts, rdtype)
        if weight is not None:
            k = k * weight  # (C, H, W/n, D) * (H, W/n, D) broadcasts over C

        # 5) inverse: H, then trade back, then (W, D)
        k = jnp.fft.ifft(k, axis=1)
        k = jax.lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2,
                               tiled=True)
        out = jnp.fft.ifftn(k, axes=(-2, -1))
        return out.real.astype(x.dtype)

    sharding = NamedSharding(mesh, P(None, axis_name))
    x = jax.device_put(x, sharding)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, axis_name), P()),
                   out_specs=P(None, axis_name))
    return jax.jit(fn)(x, key)
