"""Fused on-device k-space stylization: one FFT -> everything -> one iFFT.

The reference applies each corruption as its own CPU-side FFT round trip in
dataloader workers (pipeline order Gibbs -> planes -> wrap -> salt&pepper,
e.g. ``10_scripts/127_.../stylized_gibbs12p5_spikes15_wrap0p5_sap0p05_FLAIR.py:138-141``).
Here the whole stack runs on the TPU inside the train step with a *single*
forward/inverse FFT pair per volume and **no fftshift/ifftshift rolls at
all**: every k-space index computation (radial masks, wraparound parity,
spike/plane point writes) is carried out directly in raw FFT coordinates via
the index map ``shifted = (raw + floor(n/2)) mod n``. The two shift rolls the
reference performs per round trip are full HBM passes over the complex
volume; generating masks from ``broadcasted_iota`` in raw coordinates makes
them free and leaves exactly one HBM round trip between the FFTs.

Semantics note: the reference's sequential version projects to the real part
between corruptions. For real inputs the fused path runs entirely on the
rfft half spectrum (see ``_rfft_eligible``), whose Hermitian representation
IS the realified state — every stage (symmetrized weights, pair-averaged
zero-fill, Hermitian-projected point writes) applies exactly what the
reference's per-stage ``.real`` realifies, so the fused stacked output
matches the sequential reference-order composition (disk -> plane -> wrap ->
s&p, real projection between stages) within 2e-4 relative at BraTS size
(tests/test_fused.py::test_stacked_fused_matches_sequential_*). The
stage order of the reference is preserved exactly: the wraparound weight is
deferred past the plane/spike write whenever magnitude edits are enabled.
One documented exception: when an earlier mask already ZEROED the k-point a
plane/spike later writes (every 127_-family config: disk_r=12.5, shell
(55,55,30)), the reference re-reads ``angle(~0)`` after its extra FFT round
trip — roundoff noise — so its own output phase there is ill-defined; the
fused path pins that phase to 0. The corruption is identical in k-space
magnitude (asserted in test_stacked_masked_plane_point_matches_in_magnitude);
only the arbitrary phase offset of the injected plane wave differs. For
bit-parity with the reference's per-op results use the functions in
:mod:`mvtb_tpu.ops.corruptions` (the transform API does). The fused path is
the production augmentation engine; single-stage configs match the per-op
results exactly (see tests/test_fused.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mvtb_tpu.ops.fourier import from_polar
from mvtb_tpu.ops.masks import ellipsoid_shell_mask

Array = jnp.ndarray
ParamSpec = Union[float, Tuple[float, float]]  # fixed value or U[lo,hi] range


@dataclasses.dataclass(frozen=True)
class StylizeConfig:
    """Static configuration of the fused corruption stack.

    Every stage is optional (None disables it, statically). A ``ParamSpec``
    is either a fixed float or a ``(lo, hi)`` tuple sampled uniformly per
    call. ``*_prob`` gates each stage per call with a Bernoulli draw (as the
    reference's ``RandomizableTransform`` prob does per sample).
    """

    n_dims: int = 3
    # Gibbs via GibbsNoise convention: alpha in [0,1], radius (1-a)*max*sqrt2/2
    gibbs_alpha: Optional[ParamSpec] = None
    gibbs_prob: float = 1.0
    # Gibbs via RandFourierDiskMaskd convention: explicit radius
    disk_r: Optional[ParamSpec] = None
    disk_inside_off: bool = False
    disk_prob: float = 1.0
    # Wraparound
    wrap_alpha: Optional[ParamSpec] = None
    wrap_prob: float = 1.0
    # k-space spikes (None range -> data-dependent default 0.95x..1.10x mean)
    spike: bool = False
    spike_range: Optional[Tuple[float, float]] = None
    spike_channel_wise: bool = True
    spike_prob: float = 1.0
    # Plane wave on an ellipsoid shell: (a, b, c) semi-axes + log-intensity
    plane_axes: Optional[Tuple[float, float, float]] = None
    plane_intensity: float = 1.0
    plane_prob: float = 1.0
    # Random zero-fill in k-space
    zf_p: Optional[float] = None
    zf_prob: float = 1.0
    # Image-domain salt & pepper
    sap_p: Optional[ParamSpec] = None
    sap_prob: float = 1.0
    # Fourier backend: "auto" (the default — "dft" on accelerators when
    # every spatial dim fits the MXU bound, jnp.fft otherwise/on CPU),
    # "dft" (all-axis matmul-DFT at Precision.HIGHEST with Gauss's
    # 3-matmul complex contraction — f32-accurate, the measured fastest
    # on every production shape; BENCHMARKS.md config 8), "hybrid" (XLA
    # FFT for 2/3/5-smooth axis lengths, matmul-DFT for the rest), "xla"
    # (jnp.fft, mixed-radix/Bluestein on the VPU), "dft_fast"
    # (single-pass bf16 matmuls, f32 accumulation — fastest mode at
    # ~1e-2 relative error), or "dft_pallas" (the same matmul-DFT chain
    # as "dft" run through fused Pallas axis kernels — one VMEM pass per
    # axis; measured vs "dft" in BENCHMARKS.md), or "plane"/"plane_fast"
    # (the fused Pallas plane kernel, ops/fused_plane.py: the whole
    # k-space stack in one VMEM pass per (channel, half-H) plane;
    # "plane_fast" = single-pass bf16 dots, the measured-fastest backend
    # at ~1e-2 relative error; ineligible configs fall back to
    # "dft"/"dft_fast").
    fft_backend: str = "auto"

    @property
    def any_enabled(self) -> bool:
        return any(
            v is not None
            for v in (self.gibbs_alpha, self.disk_r, self.wrap_alpha,
                      self.plane_axes, self.zf_p, self.sap_p)
        ) or self.spike

    @property
    def kspace_needed(self) -> bool:
        return (self.gibbs_alpha is not None or self.disk_r is not None
                or self.wrap_alpha is not None or self.spike
                or self.plane_axes is not None or self.zf_p is not None)


def _sample(key: jax.Array, spec: ParamSpec, dtype) -> Array:
    if isinstance(spec, tuple):
        return jax.random.uniform(key, (), dtype, spec[0], spec[1])
    return jnp.asarray(spec, dtype)


def _gate(key: jax.Array, prob: float) -> Array:
    if prob >= 1.0:
        return jnp.asarray(True)
    return jax.random.bernoulli(key, prob)


def _off_of(i: Array, n: int) -> Array:
    """Offset-from-center of raw FFT index array ``i`` (any shape, float32).

    For raw index i and c = floor(n/2): the fftshifted position is
    ``s = (i + c) mod n``, so the offset from the shifted center is
    ``s - c = i`` for ``i < n - c`` and ``i - n`` otherwise. The SAME
    function evaluates the weight on the full grid (``i`` = iota) and at
    individual k-points (``i`` = a (C,) location vector) — sharing the math
    keeps the two bit-identical, which the one-pass point-write path relies
    on (see :func:`stylize_kspace`).
    """
    c = n // 2
    return jnp.where(i < n - c, i, i - n)


def _raw_offset(grid, axis: int, n: Optional[int] = None) -> Array:
    """Per-axis offset-from-center grid in RAW (unshifted) FFT coordinates.

    Generated from iota, so XLA fuses it into the consuming elementwise op —
    nothing is read from HBM. ``grid`` may be the rfft half-spectrum shape;
    ``n`` is the logical (full) axis length (defaults to the grid's).
    """
    n = grid[axis] if n is None else n
    i = jax.lax.broadcasted_iota(jnp.float32, grid, axis)
    return _off_of(i, n)


def _raw_dist_sq(spatial, center_shift: Tuple[float, ...],
                 grid=None) -> Array:
    """Squared distance from (shifted-space) center + per-axis shift deltas.

    ``grid`` (default ``spatial``) is the array shape to generate — pass the
    rfft half-spectrum shape to build the weight directly on half-k.
    """
    grid = tuple(spatial) if grid is None else tuple(grid)
    total = jnp.zeros(grid, jnp.float32)
    for axis in range(len(grid)):
        off = _raw_offset(grid, axis, spatial[axis]) - center_shift[axis]
        total = total + off * off
    return total


def _resolve_backend(backend: str, spatial) -> str:
    """Resolve ``StylizeConfig.fft_backend`` to a concrete backend.

    ``"auto"`` picks the all-axis MXU matmul-DFT (``"dft"``, Precision.HIGHEST
    — ~2e-7 relative to jnp.fft) whenever the default backend is an
    accelerator and every spatial dim fits the MXU-friendly bound. With
    Gauss's 3-matmul complex contraction (ops/dft.py) it is the measured
    fastest backend even on fully 2/3/5-smooth shapes where XLA's FFT is at
    its best (BENCHMARKS.md config 8: 21.8 vs hybrid 23.6 vs XLA 37.8
    ms/batch on the 240x240x155 headline; 1.57 vs 2.30 at 128x128x64; 0.14
    vs 0.29 on the 2D 240x240 suite). On CPU — where the O(n) extra MACs
    are real time and tests want bit-parity with numpy's FFT — and for
    oversized axes it stays on ``jnp.fft``. Resolution happens at trace
    time, so each jitted program is pinned to one backend.
    """
    if backend != "auto":
        if backend not in ("xla", "dft", "dft_fast", "hybrid", "dft_pallas",
                           "plane", "plane_fast"):
            raise ValueError(f"unknown fft_backend {backend!r}")
        return backend
    from mvtb_tpu.ops.dft import use_matmul_dft

    if jax.default_backend() != "cpu" and use_matmul_dft(spatial):
        return "dft"
    return "xla"


def _rfft_eligible(cfg: StylizeConfig, spatial) -> bool:
    """True when the k-space portion can run through rfftn/irfftn (half the
    FFT flops and half the elementwise/HBM traffic on the weight multiply).

    Every k-space stage now rides the half spectrum, because for a real
    input the final ``.real`` projection — which the reference's sequential
    per-op composition also applies — makes each edit exactly
    Hermitian-representable:

    * Mod-n-symmetric multiplicative weights (``w[i] == w[(n-i) % n]``) —
      the disk mask (center floor(n/2)) and the wraparound parity weight for
      ALL sizes — keep the spectrum Hermitian as-is.
    * Asymmetric real weights realify to the SYMMETRIZED weight
      ``(w[i] + w[-i])/2`` (the Hermitian part of ``w*K`` for Hermitian
      ``K``), so the GibbsNoise mask at even sizes applies its mirror
      average explicitly, and random zero-fill draws iid Bernoulli keeps
      per conjugate pair and applies ``(b_i + b_{-i})/2`` (see the zf stage
      in :func:`stylize_kspace` for the boundary-slab pairing).
    * Point writes (spike/plane): writing ``w`` at point ``s`` then
      realifying yields the spectrum update ``K[s] = (w + conj(k[-s]))/2``
      with the conjugate at ``-s`` — i.e. the half-grid update
      ``H[c] += (w - k[s])/2`` (conjugated when ``s``'s canonical half-grid
      representative ``c`` is its mirror). irfftn's implicit completion
      places ``conj(H[c])`` at the true Hermitian mirror ``-c`` (and drops
      the imaginary part at fully self-mirrored points), which is precisely
      the projection the complex path applies — see ``point_update`` below.

    Verified against the complex path in tests/test_fused.py. The complex
    path remains reachable (it is what non-real inputs or future
    complex-valued stages would use) and is kept measured in BENCHMARKS.md.

    NOTE: this function is a deliberate monkeypatch seam — benchmarks.py
    (config 7's forced-complex leg) and tests/test_fused.py patch it to
    False to drive the complex path. Do not inline it into
    ``stylize_kspace``.
    """
    del spatial  # shape no longer affects eligibility; kept for the seam API
    return cfg.kspace_needed


def _to_raw_index(shifted_idx, n: int):
    """Map a shifted-space index to raw FFT coordinates: ``(s - c) mod n``."""
    return (shifted_idx - n // 2) % n


def stage_keys(key: jax.Array, cfg: StylizeConfig) -> dict:
    """Deterministic per-stage PRNG key assignment for one stylize call.

    Exposed so tests (and any sequential re-composition) can replay the exact
    random draws :func:`stylize_kspace` makes: keys come from one
    ``split(key, 16)`` consumed in fixed stage order — gibbs, disk, wrap,
    zero-fill, spike, plane, salt&pepper — two keys per stage (parameter,
    gate) except spike (loc, value, gate) and s&p (p, gate, u). Keys are
    consumed whether or not a stage's draw is degenerate (fixed parameter or
    prob >= 1), so streams never shift between configs that share a prefix.
    """
    keys = jax.random.split(key, 16)
    kit = iter(keys)
    out = {}
    if cfg.gibbs_alpha is not None:
        out["gibbs_alpha"], out["gibbs_gate"] = next(kit), next(kit)
    if cfg.disk_r is not None:
        out["disk_r"], out["disk_gate"] = next(kit), next(kit)
    if cfg.wrap_alpha is not None:
        out["wrap_alpha"], out["wrap_gate"] = next(kit), next(kit)
    if cfg.zf_p is not None:
        out["zf_u"], out["zf_gate"] = next(kit), next(kit)
    if cfg.spike:
        out["spike_loc"], out["spike_val"], out["spike_gate"] = (
            next(kit), next(kit), next(kit))
    if cfg.plane_axes is not None:
        out["plane_loc"], out["plane_gate"] = next(kit), next(kit)
    if cfg.sap_p is not None:
        out["sap_p"], out["sap_gate"], out["sap_u"] = (
            next(kit), next(kit), next(kit))
    return out


def stylize_kspace(x: Array, key: jax.Array, cfg: StylizeConfig) -> Array:
    """Apply the configured corruption stack to one channel-first volume.

    Args:
        x: ``(C, *spatial)`` real array, ``len(spatial) == cfg.n_dims``.
        key: PRNG key consumed by all random stages of this call.
        cfg: static stage configuration.

    Returns:
        Corrupted volume, same shape/dtype as ``x``.
    """
    nd = cfg.n_dims
    if x.ndim != nd + 1:
        raise ValueError(f"expected (C, *spatial) with {nd} spatial dims, got {x.shape}")
    if not cfg.any_enabled:
        return x

    spatial = x.shape[1:]
    C = x.shape[0]
    rdtype = jnp.zeros((), x.dtype).real.dtype
    axes = tuple(range(-nd, 0))

    backend = _resolve_backend(cfg.fft_backend, spatial)
    if backend in ("plane", "plane_fast"):
        # fused Pallas plane kernel: fwd (W,D) DFT + weights + point writes
        # + inverse in ONE VMEM pass per (channel, half-H) slab. Dispatched
        # before stage_keys: the plane path derives the identical streams
        # from the same key itself.
        from mvtb_tpu.ops import fused_plane as _fp

        if _fp.plane_kernel_eligible(cfg, spatial):
            return _fp.stylize_kspace_plane(x, key, cfg)
        backend = "dft_fast" if backend == "plane_fast" else "dft"
    ks = stage_keys(key, cfg)
    if backend == "xla":
        fwd_r, inv_r = jnp.fft.rfftn, jnp.fft.irfftn
        fwd_c = jnp.fft.fftn
        inv_c_real = lambda k, axes: jnp.fft.ifftn(k, axes=axes).real
    elif backend == "hybrid":
        from mvtb_tpu.ops import dft as _dft

        prec = jax.lax.Precision.HIGHEST
        fwd_r = partial(_dft.hybrid_rdft_nd, precision=prec)
        inv_r = partial(_dft.hybrid_irdft_nd_real, precision=prec)
        fwd_c = partial(_dft.hybrid_dft_nd, precision=prec)
        inv_c_real = partial(_dft.hybrid_idft_nd_real, precision=prec)
    elif backend == "dft_pallas":
        from mvtb_tpu.ops import pallas_dft as _pdft

        # interpret mode on CPU so the same config traces everywhere;
        # compiled Mosaic kernels on accelerators. HIGH = in-kernel bf16x3
        # (~1e-5 relative) — Mosaic's native-f32 dot is ~3x slower than
        # XLA's, so the kernel matches XLA's MXU cost this way (measured,
        # BENCHMARKS.md).
        kw = dict(precision=jax.lax.Precision.HIGH,
                  interpret=jax.default_backend() == "cpu")
        fwd_r = partial(_pdft.rdft_nd, **kw)
        inv_r = partial(_pdft.irdft_nd_real, **kw)
        fwd_c = partial(_pdft.dft_nd, **kw)
        inv_c_real = partial(_pdft.idft_nd_real, **kw)
    else:
        from mvtb_tpu.ops import dft as _dft

        prec = (jax.lax.Precision.DEFAULT if backend == "dft_fast"
                else jax.lax.Precision.HIGHEST)
        fwd_r = partial(_dft.rdft_nd, precision=prec)
        inv_r = partial(_dft.irdft_nd_real, precision=prec)
        fwd_c = partial(_dft.dft_nd, precision=prec)
        inv_c_real = partial(_dft.idft_nd_real, precision=prec)

    out = x
    if cfg.kspace_needed:
        # rfft fast path: mask-only configs with mod-n-symmetric weights run
        # on the half spectrum — half the FFT flops, half the multiply/HBM
        use_rfft = _rfft_eligible(cfg, spatial)
        if use_rfft:
            k = fwd_r(x, axes=axes)
            grid = spatial[:-1] + (spatial[-1] // 2 + 1,)
        else:
            k = fwd_c(x, axes=axes)  # RAW coordinates — no shift rolls
            grid = spatial

        # ---- multiplicative weight: ONE shared definition ----
        # Each stage contributes a callable over per-axis raw-index arrays
        # (int32). Evaluated on broadcasted iotas it yields the grid weight
        # (fused into the multiply — nothing read from HBM); evaluated on a
        # (C,) location vector it yields the weight AT a k-point, which the
        # one-pass point-write path below uses. Sharing the arithmetic makes
        # the two bit-identical (int->f32 casts of exact small ints are
        # exact, and the 0/1/0.5/alpha factor products commute exactly).
        wparts = []  # in reference stage order: gibbs, disk, wrap

        if cfg.gibbs_alpha is not None:
            # GibbsNoise center is (n-1)/2: shifted-center delta (n-1)/2 - n//2
            deltas = tuple((n - 1) / 2 - n // 2 for n in spatial)
            alpha = _sample(ks["gibbs_alpha"], cfg.gibbs_alpha, rdtype)
            r_g = (1.0 - alpha) * max(spatial) * math.sqrt(2.0) / 2.0
            g_g = _gate(ks["gibbs_gate"], cfg.gibbs_prob)
            sym = use_rfft and any(d != 0 for d in deltas)

            def gibbs_part(idx, _r=r_g, _g=g_g, _deltas=deltas, _sym=sym):
                dist_sq = None
                for axis in range(nd):
                    off = (_off_of(idx[axis].astype(jnp.float32),
                                   spatial[axis]) - _deltas[axis])
                    sq = off * off
                    dist_sq = sq if dist_sq is None else dist_sq + sq
                m = (dist_sq <= _r * _r).astype(rdtype)
                if _sym:
                    # Even axes make the (n-1)/2-centered mask mod-n
                    # asymmetric; the final .real projection applies the
                    # SYMMETRIZED weight (w[i]+w[-i])/2 — in the reference's
                    # sequential op too — so the half spectrum carries that
                    # symmetrization explicitly. The mirror of raw offset o
                    # is -o EXCEPT at an even axis's Nyquist index (o = -n/2
                    # is self-mirrored and keeps its offset; +n/2 is not a
                    # representable frequency). This is the same
                    # conjugate-pair mirror the zero-fill stage below
                    # realizes by roll/flip FIELD indexing — offsets here,
                    # array indices there; keep the two in sync.
                    dist_sq_m = None
                    for axis in range(nd):
                        n_ax = spatial[axis]
                        off = _off_of(idx[axis].astype(jnp.float32), n_ax)
                        off_m = -off
                        if n_ax % 2 == 0:
                            off_m = jnp.where(off == -(n_ax // 2), off, off_m)
                        dd = off_m - _deltas[axis]
                        sq = dd * dd
                        dist_sq_m = sq if dist_sq_m is None else dist_sq_m + sq
                    m = (m + (dist_sq_m <= _r * _r).astype(rdtype)) * 0.5
                return jnp.where(_g, m, jnp.ones((), rdtype))

            wparts.append(gibbs_part)

        if cfg.disk_r is not None:
            r_d = _sample(ks["disk_r"], cfg.disk_r, rdtype)
            g_d = _gate(ks["disk_gate"], cfg.disk_prob)

            def disk_part(idx, _r=r_d, _g=g_d):
                dist_sq = None
                for axis in range(nd):
                    off = (_off_of(idx[axis].astype(jnp.float32),
                                   spatial[axis]) - 0.0)
                    sq = off * off
                    dist_sq = sq if dist_sq is None else dist_sq + sq
                inside = dist_sq < _r * _r
                m = (jnp.logical_not(inside)
                     if cfg.disk_inside_off else inside).astype(rdtype)
                return jnp.where(_g, m, jnp.ones((), rdtype))

            wparts.append(disk_part)

        # ---- wraparound: parity of the SHIFTED index, computed raw ----
        # The reference's stacked order is Gibbs -> planes -> wrap
        # (127_.../:138-141) — wrap scales the plane/spike-written point too
        # — preserved by scaling each WRITTEN value with the wrap parity
        # factor at its location (multiplying first is equivalent elsewhere:
        # the weights commute).
        wrap_alpha_val = None
        if cfg.wrap_alpha is not None:
            alpha = _sample(ks["wrap_alpha"], cfg.wrap_alpha, rdtype)
            g_w = _gate(ks["wrap_gate"], cfg.wrap_prob)
            wrap_alpha_val = jnp.where(g_w, alpha, jnp.ones((), rdtype))

            def wrap_part(idx, _a=wrap_alpha_val):
                w = None
                for d in range(nd):
                    n = spatial[d]
                    c = n // 2
                    i = idx[d]
                    s = jnp.where(i < n - c, i + c, i + c - n)  # shifted
                    wd = jnp.where(s % 2 == 1, _a, jnp.ones((), rdtype))
                    w = wd if w is None else w * wd
                return w

            wparts.append(wrap_part)

        def weight_of(idx):
            w = None
            for part in wparts:
                f = part(idx)
                w = f if w is None else w * f
            return w

        weight = (weight_of(tuple(
            jax.lax.broadcasted_iota(jnp.int32, grid, d) for d in range(nd)))
            if wparts else None)

        # One-pass point strategy: when magnitude edits are enabled and no
        # zero-fill stage sits between the weight and the writes, the weight
        # multiply is DEFERRED into a single write pass that also applies
        # every point delta (see below); otherwise multiply here.
        fast_points = ((cfg.spike or cfg.plane_axes is not None)
                       and cfg.zf_p is None)
        if weight is not None and not fast_points:
            k = k * weight  # single fused elementwise pass over k

        # ---- zero-fill ----
        if cfg.zf_p is not None:
            g = _gate(ks["zf_gate"], cfg.zf_prob)
            if use_rfft:
                # The realified full-grid weight at a conjugate pair (i, -i)
                # is (b_i + b_{-i})/2 with iid Bernoulli keeps — the same
                # projection the reference's per-op .real applies. On the
                # half grid: interior bins pair with an off-grid mirror
                # (second independent field); bins whose LAST-axis index is
                # self-mirrored (0, and n/2 for even n) pair within the slab
                # at the other-axes mirrored position (roll-flip indexing —
                # the index-space form of the offset mirror the gibbs stage
                # above uses; keep the two in sync); fully self-paired
                # points degenerate to a single draw automatically
                # (b1m == b1 there).
                u1 = jax.random.uniform(ks["zf_u"], k.shape, rdtype)
                u2 = jax.random.uniform(jax.random.fold_in(ks["zf_u"], 1),
                                        k.shape, rdtype)
                b1 = (u1 > cfg.zf_p).astype(rdtype)
                b2 = (u2 > cfg.zf_p).astype(rdtype)
                b1m = b1
                for ax in range(-nd, -1):
                    b1m = jnp.roll(jnp.flip(b1m, ax), 1, ax)
                n_last = spatial[-1]
                h = jax.lax.broadcasted_iota(jnp.int32, k.shape, k.ndim - 1)
                h_self = jnp.logical_or(
                    h == 0, (n_last % 2 == 0) & (h == n_last // 2))
                w_zf = jnp.where(h_self, (b1 + b1m) * 0.5, (b1 + b2) * 0.5)
                k = k * jnp.where(g, w_zf, jnp.ones((), rdtype))
            else:
                u = jax.random.uniform(ks["zf_u"], k.shape, rdtype)
                keep = jnp.logical_or(u > cfg.zf_p, jnp.logical_not(g))
                k = k * keep.astype(rdtype)

        # ---- magnitude-domain edits (spikes / plane waves) ----
        # A write at ONE k-point per channel only needs that point. The
        # round-1 implementation reconstructed the ENTIRE volume through
        # log/angle -> exp/cos/sin (a ~2 ms/volume elementwise tail at BraTS
        # size). Round 2 read each point with a fused iota-mask reduction
        # and wrote it back with a fused select — but sequentially: weight
        # pass, spike read, spike write, plane read, plane write = ~5 HBM
        # sweeps of the spectrum. Now (``fast_points``) every point is read
        # from the RAW spectrum in ONE fused pass, the weight AT each point
        # is evaluated scalar-side with the shared ``weight_of`` arithmetic
        # (bit-identical to the grid weight, and multiplication commutes
        # exactly), deltas/new values are computed on (C,) vectors, and one
        # fused write pass applies ``k*weight`` plus every point edit. The
        # zero-fill stage is a full random FIELD between weight and writes —
        # its value at a point is not scalar-evaluable — so zf configs keep
        # the sequential ``point_update`` path. (A gather/scatter or
        # dynamic-slice formulation of the reads makes XLA pick a
        # channel-minor tiled layout whose padded copy is ~50x the array —
        # OOM at the 240x240x155 headline size; the iota-mask forms stay in
        # the natural layout.) The reference's post-write wraparound (its
        # stage order) is the parity factor at the written location.
        if cfg.spike or cfg.plane_axes is not None:
            spatial_axes = tuple(range(-nd, 0))
            iotas = [jax.lax.broadcasted_iota(jnp.int32, grid, d)
                     for d in range(nd)]
            cdim = (slice(None),) + (None,) * nd
            czero = jnp.zeros((), k.dtype)

            def wrap_at(shifted):
                f = jnp.ones((), rdtype)
                if wrap_alpha_val is None:
                    return f
                for d in range(nd):
                    f = f * jnp.where(shifted[d] % 2 == 1, wrap_alpha_val,
                                      jnp.ones((), rdtype))
                return f

            def canon_locs(raw_locs):
                """Canonicalize (C,) raw FULL-grid indices into the stored
                grid. rfft mode: points whose last index falls in the
                discarded half mirror through ``-s mod n`` (value reads
                conjugated); complex mode: identity."""
                if not use_rfft:
                    return raw_locs, None
                in_half = raw_locs[-1] < grid[-1]
                locs = tuple(
                    jnp.where(in_half, raw_locs[d],
                              (spatial[d] - raw_locs[d]) % spatial[d])
                    for d in range(nd))
                return locs, in_half

            def pos_of(locs):
                pos = None
                for d in range(nd):
                    eq = iotas[d][None] == locs[d][cdim]
                    pos = eq if pos is None else pos & eq
                return pos

            def weight_at(locs):
                """Grid-weight value at (C,) canonical locations — the same
                ``weight_of`` arithmetic the grid multiply uses."""
                if not wparts:
                    return jnp.ones((C,), rdtype)
                return jnp.broadcast_to(weight_of(locs), (C,)).astype(rdtype)

            def rfft_delta(old, locs, in_half, target_mag, gates):
                """The realified-write update derived in ``_rfft_eligible``:
                ``H[c] += (w - k[s]) * scale`` for the per-channel point
                value ``old = k[s]`` at canonical locs ``locs``. ``scale``
                accounts for irfftn's completion coefficient (verified
                exhaustively over all grid points, tests/test_fused.py):
                interior last-axis bins contribute ``delta`` at ``s`` plus
                ``conj(delta)`` at the true Hermitian mirror ``-s`` (scale
                1/2); on the self-mirrored last-axis bins (0 and n/2) the
                in-plane Hermitian projection halves the contribution (scale
                1 — including fully self-mirrored points, where only
                ``Re(delta)`` survives but the full path likewise keeps only
                ``Re(w)``). The += form also makes colliding per-channel
                writes accumulate instead of last-write-wins."""
                new = from_polar(target_mag.astype(rdtype), jnp.angle(old))
                z_self = (locs[-1] == 0) | (2 * locs[-1] == spatial[-1])
                scale = jnp.where(z_self, 1.0, 0.5).astype(rdtype)
                delta = (new - old) * scale
                delta = jnp.where(in_half, delta, jnp.conj(delta))
                return jnp.where(gates, delta, czero)

            def point_update(kk, raw_locs, target_mag, gates):
                """Sequential form (zf-coexistence path): set |k| to
                ``target_mag`` (keeping phase) at the per-channel point
                ``raw_locs``, where ``gates`` (C,) allows — fused iota-mask
                read + select write (complex) / Hermitian-projected +=
                (rfft, see :func:`rfft_delta`)."""
                locs, in_half = canon_locs(raw_locs)
                pos = pos_of(locs)
                read = jnp.sum(jnp.where(pos, kk, czero),
                               axis=spatial_axes)  # (C,) fused reduction
                if not use_rfft:
                    new = from_polar(target_mag.astype(rdtype),
                                     jnp.angle(read))
                    write = pos & gates[cdim]
                    return jnp.where(write, new[cdim], kk)
                old = jnp.where(in_half, read, jnp.conj(read))  # k[s]
                delta = rfft_delta(old, locs, in_half, target_mag, gates)
                return kk + jnp.where(pos, delta[cdim], czero)

            # In the slow path ``k`` is already weighted (and zero-filled);
            # in the fast path the weighted spectrum exists only as an
            # expression — XLA fuses the iota-built weight into whichever
            # pass consumes it (the data-dependent spike mean below and the
            # final write pass), so it is never materialized on its own.
            kw_view = k if not fast_points else (
                k * weight if weight is not None else k)

            spike_args = None
            if cfg.spike:
                if cfg.spike_range is None:
                    logmag = jnp.log(jnp.abs(kw_view) + 1e-10)
                    if use_rfft:
                        # full-grid mean from the half spectrum: interior
                        # last-axis bins appear twice in the full grid
                        # (|k| at a point equals |k| at its mirror)
                        w_last = jnp.full((grid[-1],), 2.0, rdtype)
                        w_last = w_last.at[0].set(1.0)
                        if spatial[-1] % 2 == 0:
                            w_last = w_last.at[-1].set(1.0)
                        means = (jnp.sum(logmag * w_last, axis=spatial_axes)
                                 / float(math.prod(spatial)))
                    else:
                        means = jnp.mean(logmag, axis=spatial_axes)
                    lo, hi = means * 0.95, means * 1.10
                else:
                    lo = jnp.full((C,), cfg.spike_range[0], rdtype)
                    hi = jnp.full((C,), cfg.spike_range[1], rdtype)
                loc_keys = jax.random.split(ks["spike_loc"], nd)
                # sample in shifted coordinates (uniform either way), then
                # map to raw so results match the shifted-space reference
                if cfg.spike_channel_wise:
                    shifted = tuple(
                        jax.random.randint(loc_keys[d], (C,), 0, spatial[d])
                        for d in range(nd)
                    )
                    vals = lo + (hi - lo) * jax.random.uniform(ks["spike_val"], (C,), rdtype)
                    gates = jax.random.bernoulli(ks["spike_gate"], cfg.spike_prob, (C,))
                else:
                    scalar_shifted = tuple(
                        jax.random.randint(loc_keys[d], (), 0, spatial[d])
                        for d in range(nd)
                    )
                    shifted = tuple(jnp.full((C,), s) for s in scalar_shifted)
                    u = jax.random.uniform(ks["spike_val"], (), rdtype)
                    vals = jnp.broadcast_to(lo + (hi - lo) * u, (C,))
                    gates = jnp.full((C,), _gate(ks["spike_gate"], cfg.spike_prob))
                locs = tuple(_to_raw_index(shifted[d], spatial[d])
                             for d in range(nd))
                spike_args = (locs, jnp.exp(vals) * wrap_at(shifted), gates)

            plane_args = None
            if cfg.plane_axes is not None:
                a, b, c3 = cfg.plane_axes
                shell = jnp.asarray(ellipsoid_shell_mask(spatial, a, b, c3).ravel())
                logits = jnp.where(shell, 0.0, -jnp.inf)
                flat = jax.random.categorical(ks["plane_loc"], logits)
                loc = jnp.unravel_index(flat, spatial)  # shifted coords
                raw = tuple(jnp.full((C,), _to_raw_index(loc[d], spatial[d]))
                            for d in range(nd))
                g = _gate(ks["plane_gate"], cfg.plane_prob)
                mag = jnp.full((C,), jnp.exp(
                    jnp.asarray(cfg.plane_intensity, rdtype))) * wrap_at(loc)
                plane_args = (raw, mag, jnp.full((C,), g))

            if not fast_points:
                if spike_args is not None:
                    k = point_update(k, *spike_args)
                if plane_args is not None:
                    k = point_update(k, *plane_args)
            else:
                # ---- one-pass reads, scalar deltas, one-pass write ----
                if spike_args is not None:
                    locs_s, in_half_s = canon_locs(spike_args[0])
                    pos_s = pos_of(locs_s)
                    read_s_raw = jnp.sum(jnp.where(pos_s, k, czero),
                                         axis=spatial_axes)
                if plane_args is not None:
                    locs_p, in_half_p = canon_locs(plane_args[0])
                    pos_p = pos_of(locs_p)
                    read_p_raw = jnp.sum(jnp.where(pos_p, k, czero),
                                         axis=spatial_axes)
                # (both reductions above fuse into one sweep over raw k)

                coll = None  # per-channel canonical-loc collision mask
                if spike_args is not None and plane_args is not None:
                    coll = None
                    for d in range(nd):
                        eq = locs_s[d] == locs_p[d]
                        coll = eq if coll is None else coll & eq

                # ``raw * weight`` keeps the RAW value's zero signs when the
                # weight is 0, but the sequential path reads the WEIGHTED
                # grid through a masked sum whose (+0) filler canonicalizes
                # any -0 ((-0) + (+0) = +0) — and jnp.angle(-0+0j) is pi,
                # not 0, so the written value's sign would flip at
                # weight-zeroed points. ``+ czero`` is NOT enough: the TPU
                # compile pipeline (--xla_allow_excess_precision) folds the
                # constant-zero add away and the -0 survives — caught by the
                # plane-kernel parity drive, which pinned phase 0 while the
                # compiled dft path wrote -|w| at a disk-zeroed spike point.
                # A select on ==0 cannot be simplified away and leaves every
                # nonzero bit pattern untouched.
                def canon_zero(z):
                    return jnp.where(z == czero, czero, z)
                if use_rfft:
                    delta_s = delta_p = None
                    if spike_args is not None:
                        read_s = canon_zero(read_s_raw * weight_at(locs_s))
                        old_s = jnp.where(in_half_s, read_s,
                                          jnp.conj(read_s))
                        delta_s = rfft_delta(old_s, locs_s, in_half_s,
                                             spike_args[1], spike_args[2])
                    if plane_args is not None:
                        read_p = canon_zero(read_p_raw * weight_at(locs_p))
                        if coll is not None:
                            # plane reads the post-spike spectrum: add the
                            # spike's (gated) delta where the canonical
                            # locations coincide (same channel only — each
                            # channel owns its own grid)
                            read_p = read_p + jnp.where(coll, delta_s, czero)
                        old_p = jnp.where(in_half_p, read_p,
                                          jnp.conj(read_p))
                        delta_p = rfft_delta(old_p, locs_p, in_half_p,
                                             plane_args[1], plane_args[2])
                    kw = kw_view
                    if delta_s is not None:
                        kw = kw + jnp.where(pos_s, delta_s[cdim], czero)
                    if delta_p is not None:
                        kw = kw + jnp.where(pos_p, delta_p[cdim], czero)
                    k = kw
                else:
                    new_s = None
                    if spike_args is not None:
                        read_s = canon_zero(read_s_raw * weight_at(locs_s))
                        new_s = from_polar(spike_args[1].astype(rdtype),
                                           jnp.angle(read_s))
                    kw = kw_view
                    if spike_args is not None:
                        kw = jnp.where(pos_s & spike_args[2][cdim],
                                       new_s[cdim], kw)
                    if plane_args is not None:
                        read_p = canon_zero(read_p_raw * weight_at(locs_p))
                        if coll is not None:
                            # set semantics: a gated spike write at the same
                            # point is what the plane would read back
                            read_p = jnp.where(coll & spike_args[2],
                                               new_s, read_p)
                        new_p = from_polar(plane_args[1].astype(rdtype),
                                           jnp.angle(read_p))
                        kw = jnp.where(pos_p & plane_args[2][cdim],
                                       new_p[cdim], kw)
                    k = kw

        if use_rfft:
            out = inv_r(k, s=spatial, axes=axes).astype(x.dtype)
        else:
            out = inv_c_real(k, axes=axes).astype(x.dtype)

    # ---- image-domain salt & pepper ----
    if cfg.sap_p is not None:
        p = _sample(ks["sap_p"], cfg.sap_p, rdtype)
        g = _gate(ks["sap_gate"], cfg.sap_prob)
        p = jnp.where(g, p, jnp.zeros((), rdtype))
        u = jax.random.uniform(ks["sap_u"], out.shape, rdtype)
        lo = out.min() / 2
        hi = out.max() / 2
        styled = jnp.where(u <= p / 2, lo, out)
        out = jnp.where((u > p / 2) & (u <= p), hi, styled)

    return out


@partial(jax.jit, static_argnames=("cfg",))
def stylize_batch(x: Array, key: jax.Array, cfg: StylizeConfig) -> Array:
    """vmap of :func:`stylize_kspace` over a leading batch axis.

    Jitted at the boundary: inside an outer jit this inlines, and eager
    callers (evaluation sweeps) get one compiled program instead of op-by-op
    dispatch — which on this TPU runtime is both ~100x slower through the
    tunnel and can hit unimplemented standalone lowerings (a batched
    complex-select in the plane-wave path fails eagerly at some shapes).
    """
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(stylize_kspace, in_axes=(0, 0, None))(x, keys, cfg)
