"""One-kernel k-space stylization: the (W, D) plane never leaves VMEM.

Motivation (measured, BENCHMARKS.md): the stylize transform chain is
HBM-bound and XLA already runs each matmul-DFT axis step at the ~860 GB/s
read roofline, while the Pallas DMA pipeline on this runtime moves only
~400 GB/s — so per-axis Pallas kernels lose. The only kernel that can win
is one that cuts total HBM traffic by MORE than that bandwidth deficit.
This module is that kernel: for each (channel, half-H) slab it performs

    forward DFT over W -> forward DFT over D -> multiplicative k-space
    weights (Gibbs / disk / wraparound) -> spike & plane-wave point writes
    -> inverse DFT over D -> inverse DFT over W

entirely in VMEM — ONE HBM read and ONE write of the spectrum where the
XLA chain pays ~4 axis round trips plus the weight/write pass (~10+ sweeps).

Layout: the rfft half spectrum lives on the **H axis** (``dft.half_dft_axis``)
instead of the usual last axis, so each kernel tile is a ``(W, D)`` plane —
the two *trailing, contiguous* dimensions — and the DMA needs no transposes.
All k-space semantics are ports of :mod:`mvtb_tpu.ops.fused` (reference
behavior documented there, cf. ``source_code/filters_and_operators.py``):
the half-spectrum realification rules are axis-agnostic, so moving the half
axis from D to H changes the representation, not the realified result.
Random draws consume the SAME ``stage_keys`` streams with the same shapes,
so every sampled parameter (radii, alphas, gates, spike locations/values)
is bit-identical to ``stylize_kspace``'s.

Eligibility mirrors the fast-point path: 3D, no zero-fill (a dense random
field between weight and writes), and spikes only with an explicit
intensity range (the data-dependent default needs a global reduction).
Ineligible configs fall back to the matmul-DFT path in ``stylize_kspace``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvtb_tpu.ops import dft as _dft
from mvtb_tpu.ops.masks import ellipsoid_shell_mask
from mvtb_tpu.ops.pallas_dft import _dot, _fast, _split_bf16

Array = jnp.ndarray

# VMEM budget for everything resident in the kernel, in bytes. v5e has
# ~16 MiB VMEM per core; leave headroom for Mosaic's own scratch.
_VMEM_BUDGET = 12 << 20


def _plane_vmem_bytes(W: int, D: int) -> int:
    """Bytes the kernel keeps resident: 12 (n, n) f32 DFT matrices
    (fwd/inv Gauss cos/cps/smc for W and D) + the 4 (W, D) re/im in/out
    tiles, double-buffered by the pipeline. The ``3x`` (bf16x3) dot path
    additionally materializes bf16 hi/lo splits of matrices and tiles
    in-kernel (~+50% over the f32 residents), so the estimate carries a
    1.5x factor to keep :func:`plane_kernel_eligible` conservative at
    boundary shapes regardless of precision tier."""
    f32_resident = 4 * (6 * W * W + 6 * D * D + 8 * W * D)
    return (3 * f32_resident) // 2


def plane_kernel_eligible(cfg, spatial) -> bool:
    """True when :func:`stylize_kspace_plane` implements ``cfg`` exactly."""
    if len(spatial) != 3 or not cfg.kspace_needed:
        return False
    if cfg.zf_p is not None:
        return False
    if cfg.spike and cfg.spike_range is None:
        return False  # data-dependent range needs a global log|k| mean
    H, W, D = spatial
    if _plane_vmem_bytes(W, D) > _VMEM_BUDGET:
        return False
    if max(spatial) > _dft.MATMUL_DFT_MAX_N:
        return False
    return True


def _off(i, n: int):
    """Offset-from-center of raw index ``i`` (fused.py:_off_of)."""
    return jnp.where(i < n - n // 2, i, i - n)


def _mirror_off(off, n: int):
    """Conjugate-mirror of a raw offset: ``-off`` except the self-mirrored
    Nyquist offset ``-n/2`` of an even axis (fused.py gibbs_part)."""
    if n % 2 == 0:
        return jnp.where(off == -(n // 2), off, -off)
    return -off


def _shifted(i, n: int):
    """Shifted-space index of raw index ``i`` (fused.py wrap_part)."""
    c = n // 2
    return jnp.where(i < n - c, i + c, i + c - n)


def _build_kernel(spatial, flags, fast):
    """Kernel body closure. ``flags`` is the static stage configuration:
    (has_gibbs, gibbs_sym, has_disk, inside_off, has_wrap, has_spike,
    has_plane). Traced stage parameters arrive via SMEM refs.

    Matrix operands arrive PRE-LOWERED for the precision tier: bf16 for
    ``1x``, (hi, lo) bf16 split pairs for ``3x``, f32 for ``f32``. Round
    2's kernel re-cast/re-split the 12 resident DFT matrices on EVERY
    (channel, half-H) grid step; hoisting that out of the grid loop was
    measured to change NOTHING at the headline shape (25.5 ms both ways,
    BENCHMARKS.md) — the ``3x`` tier is MXU-pass-bound (3x the dots of
    ``1x`` over 484 sequential per-tile grid steps), which is the recorded
    reason an f32-accurate plane kernel cannot beat the 21.7 ms XLA
    matmul-DFT chain. The hoist is kept: it is free, strictly less
    per-step work, and halves the 1x tier's matrix VMEM. Only the (W, D)
    data tiles are still split/cast in-kernel (they change per step).
    """
    H, W, D = spatial
    (has_gibbs, gibbs_sym, has_disk, inside_off, has_wrap,
     has_spike, has_plane) = flags
    gdeltas = tuple((n - 1) / 2 - n // 2 for n in spatial)

    from functools import partial as _partial

    dot_bf = _partial(jnp.dot, preferred_element_type=jnp.float32)

    if fast == "3x":
        # matrices are (hi, lo) pairs; tiles split once per gauss call
        def gauss_sub(cos, cps, smc, re, im):  # mat @ tile (W axis)
            s_h, s_l = _split_bf16(re + im)
            i_h, i_l = _split_bf16(im)
            r_h, r_l = _split_bf16(re)
            k1 = (dot_bf(cos[0][:], s_h) + dot_bf(cos[0][:], s_l)
                  + dot_bf(cos[1][:], s_h))
            k2 = (dot_bf(cps[0][:], i_h) + dot_bf(cps[0][:], i_l)
                  + dot_bf(cps[1][:], i_h))
            k3 = (dot_bf(smc[0][:], r_h) + dot_bf(smc[0][:], r_l)
                  + dot_bf(smc[1][:], r_h))
            return k1 - k2, k1 + k3

        def gauss_lane(cos, cps, smc, re, im):  # tile @ mat (D axis)
            s_h, s_l = _split_bf16(re + im)
            i_h, i_l = _split_bf16(im)
            r_h, r_l = _split_bf16(re)
            k1 = (dot_bf(s_h, cos[0][:]) + dot_bf(s_l, cos[0][:])
                  + dot_bf(s_h, cos[1][:]))
            k2 = (dot_bf(i_h, cps[0][:]) + dot_bf(i_l, cps[0][:])
                  + dot_bf(i_h, cps[1][:]))
            k3 = (dot_bf(r_h, smc[0][:]) + dot_bf(r_l, smc[0][:])
                  + dot_bf(r_h, smc[1][:]))
            return k1 - k2, k1 + k3
    elif fast == "1x":
        # matrices arrive bf16; only the tiles are cast per step
        def gauss_sub(cos, cps, smc, re, im):
            s = (re + im).astype(jnp.bfloat16)
            i = im.astype(jnp.bfloat16)
            r = re.astype(jnp.bfloat16)
            k1 = dot_bf(cos[:], s)
            return k1 - dot_bf(cps[:], i), k1 + dot_bf(smc[:], r)

        def gauss_lane(cos, cps, smc, re, im):
            s = (re + im).astype(jnp.bfloat16)
            i = im.astype(jnp.bfloat16)
            r = re.astype(jnp.bfloat16)
            k1 = dot_bf(s, cos[:])
            return k1 - dot_bf(i, cps[:]), k1 + dot_bf(r, smc[:])
    else:
        def gauss_sub(cos, cps, smc, re, im):  # mat @ tile (W axis)
            k1 = _dot(cos[:], re + im, fast)
            return k1 - _dot(cps[:], im, fast), k1 + _dot(smc[:], re, fast)

        def gauss_lane(cos, cps, smc, re, im):  # tile @ mat (D axis)
            k1 = _dot(re + im, cos[:], fast)
            return k1 - _dot(im, cps[:], fast), k1 + _dot(re, smc[:], fast)

    def weight_of(off_h, off_w, off_d, wp):
        """Multiplicative weight from per-axis raw offsets — the in-kernel
        twin of fused.py's ``weight_of`` (same formulas, same stage order:
        gibbs, disk, wrap). ``wp`` is the 5-scalar stage-parameter row of
        the grid's current channel (rows repeat per channel so a vmap batch
        can fold into the channel grid axis — see ``_plane_pallas``)."""
        w = None

        def mul(w, f):
            return f if w is None else w * f

        if has_gibbs:
            r2, g = wp[0], wp[1]
            d2 = ((off_h - gdeltas[0]) ** 2 + (off_w - gdeltas[1]) ** 2
                  + (off_d - gdeltas[2]) ** 2)
            m = (d2 <= r2).astype(jnp.float32)
            if gibbs_sym:
                d2m = ((_mirror_off(off_h, H) - gdeltas[0]) ** 2
                       + (_mirror_off(off_w, W) - gdeltas[1]) ** 2
                       + (_mirror_off(off_d, D) - gdeltas[2]) ** 2)
                m = (m + (d2m <= r2).astype(jnp.float32)) * 0.5
            w = mul(w, g * m + (1.0 - g))
        if has_disk:
            r2, g = wp[2], wp[3]
            d2 = off_h ** 2 + off_w ** 2 + off_d ** 2
            inside = d2 < r2
            m = (jnp.logical_not(inside) if inside_off
                 else inside).astype(jnp.float32)
            w = mul(w, g * m + (1.0 - g))
        if has_wrap:
            alpha = wp[4]  # pre-gated: where(gate, alpha, 1)
            for off, n in ((off_h, H), (off_w, W), (off_d, D)):
                s = off + jnp.where(off < 0, jnp.float32(n), jnp.float32(0))
                sh = _shifted(s, n)  # shifted index from raw index
                f = jnp.where(sh % 2 == 1, alpha, jnp.float32(1.0))
                w = mul(w, f)
        return w

    n_stages = int(has_spike) + int(has_plane)

    def kernel(wp_ref, locs_ref, vals_ref, gates_ref, conjs_ref, scales_ref,
               re_ref, im_ref, *mat_and_out_refs):
        # trailing refs: the 12 matrix slots (each a single ref, or an
        # (hi, lo) ref pair in the pre-split 3x tier) then the two outputs
        ore_ref, oim_ref = mat_and_out_refs[-2:]
        mrefs = mat_and_out_refs[:-2]
        if fast == "3x":
            mats = [(mrefs[2 * i], mrefs[2 * i + 1]) for i in range(12)]
        else:
            mats = list(mrefs)
        (wf_cos, wf_cps, wf_smc, df_cos, df_cps, df_smc,
         wi_cos, wi_cps, wi_smc, di_cos, di_cps, di_smc) = mats

        c = pl.program_id(0)
        hh = pl.program_id(1)
        re, im = re_ref[0, 0], im_ref[0, 0]

        # forward: W (sublane) then D (lane)
        re, im = gauss_sub(wf_cos, wf_cps, wf_smc, re, im)
        re, im = gauss_lane(df_cos, df_cps, df_smc, re, im)

        # ---- multiplicative weight (iota-built; Mosaic iota is int-only)
        iwi = jax.lax.broadcasted_iota(jnp.int32, (W, D), 0)
        idi = jax.lax.broadcasted_iota(jnp.int32, (W, D), 1)
        iw = iwi.astype(jnp.float32)
        idd = idi.astype(jnp.float32)
        off_h = _off(hh.astype(jnp.float32), H)
        off_w = _off(iw, W)
        off_d = _off(idd, D)
        if has_gibbs or has_disk or has_wrap:
            wp = tuple(wp_ref[c, j] for j in range(5))
            w = weight_of(off_h, off_w, off_d, wp)
            re = re * w
            im = im * w

        # ---- point writes (spike first, then plane — sequential order;
        # the plane read sees the spike's write, exactly the reference's
        # stage order). All canonicalization (half-grid mirror, conj sign,
        # Hermitian completion scale) happens in the wrapper; here each
        # stage is: masked read -> polar re-target -> masked add.
        for s in range(n_stages):
            own = (hh == locs_ref[s, c, 0]).astype(jnp.float32)
            pos = jnp.logical_and(iwi == locs_ref[s, c, 1],
                                  idi == locs_ref[s, c, 2])
            # masked sums: the (+0) filler canonicalizes any -0 exactly like
            # the sequential path's read (signed-zero k-space convention)
            zero = jnp.zeros((), jnp.float32)
            p_re = jnp.sum(jnp.where(pos, re, zero))
            p_im = jnp.sum(jnp.where(pos, im, zero))
            sgn = conjs_ref[s, c]  # +1 in-half, -1 mirrored (conj read)
            old_re, old_im = p_re, sgn * p_im
            r = jnp.sqrt(old_re * old_re + old_im * old_im)
            safe = jnp.where(r > 0, r, jnp.float32(1.0))
            cos_t = jnp.where(r > 0, old_re / safe, jnp.float32(1.0))
            sin_t = jnp.where(r > 0, old_im / safe, jnp.float32(0.0))
            mag = vals_ref[s, c]
            scale = scales_ref[s, c] * gates_ref[s, c] * own
            d_re = (mag * cos_t - old_re) * scale
            d_im = (mag * sin_t - old_im) * scale * sgn  # conj back
            re = re + jnp.where(pos, d_re, zero)
            im = im + jnp.where(pos, d_im, zero)

        # inverse: D (lane) then W (sublane)
        re, im = gauss_lane(di_cos[:], di_cps[:], di_smc[:], re, im)
        re, im = gauss_sub(wi_cos[:], wi_cps[:], wi_smc[:], re, im)
        ore_ref[0, 0] = re
        oim_ref[0, 0] = im

    return kernel


def _plane_pallas(spatial, flags, precision, interpret: bool):
    """Build the pallas_call wrapper for one static (spatial, flags) config.

    The returned function is ``custom_vmap``-wrapped: a ``jax.vmap`` over
    samples (what ``stylize_batch`` does) cannot batch a pallas_call whose
    scalar params live in SMEM (Mosaic rejects the blocked SMEM specs), so
    the batch rule instead folds the batch axis into the kernel's channel
    grid axis — every operand already carries its parameters per channel,
    so a (B, C, ...) batch is exactly a (B*C, ...) single call.
    """
    H, W, D = spatial
    fast = _fast(precision)
    kern = _build_kernel(spatial, flags, fast)

    mats = []
    for n, inverse in ((W, False), (D, False), (W, True), (D, True)):
        cos, smc, cps = _dft._gauss_dft_matrices_np(n, inverse)
        for m in (cos, cps, smc):
            # pre-lower matrices for the precision tier OUTSIDE the grid
            # loop: re-casting/re-splitting them per (c, hh) step was the
            # dominant VPU cost of the round-2 "3x" tier (see _build_kernel)
            if fast == "1x":
                mats.append(jnp.asarray(m, jnp.float32).astype(jnp.bfloat16))
            elif fast == "3x":
                m32 = jnp.asarray(m, jnp.float32)
                hi = m32.astype(jnp.bfloat16)  # same split as _split_bf16
                lo = (m32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                mats += [hi, lo]
            else:
                mats.append(jnp.asarray(m))

    @jax.custom_batching.custom_vmap
    def run(k_re, k_im, wparams, locs, vals, gates, conjs, scales):
        C, Hh = k_re.shape[:2]
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        tile = pl.BlockSpec((1, 1, W, D), lambda c, h: (c, h, 0, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(C, Hh),
            in_specs=[smem] * 6 + [tile, tile] + [mspec] * len(mats),
            out_specs=(tile, tile),
            out_shape=(jax.ShapeDtypeStruct(k_re.shape, jnp.float32),
                       jax.ShapeDtypeStruct(k_re.shape, jnp.float32)),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(wparams, locs, vals, gates, conjs, scales, k_re, k_im, *mats)

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, *args):
        B = axis_size
        k_re, k_im, wparams, locs, vals, gates, conjs, scales = (
            a if b else jnp.broadcast_to(a[None], (B,) + a.shape)
            for a, b in zip(args, in_batched))
        C = k_re.shape[1]
        S = locs.shape[1]

        def fold_stage(a):  # (B, S, C, ...) -> (S, B*C, ...)
            return jnp.moveaxis(a, 0, 1).reshape((S, B * C) + a.shape[3:])

        ore, oim = run(
            k_re.reshape((B * C,) + k_re.shape[2:]),
            k_im.reshape((B * C,) + k_im.shape[2:]),
            wparams.reshape(B * C, wparams.shape[-1]),
            fold_stage(locs), fold_stage(vals), fold_stage(gates),
            fold_stage(conjs), fold_stage(scales))
        return (ore.reshape(k_re.shape), oim.reshape(k_im.shape)), (True, True)

    return run


def plane_stylize_half(k_re: Array, k_im: Array, spatial, flags, wparams,
                       locs, vals, gates, conjs, scales,
                       precision, interpret: bool) -> Tuple[Array, Array]:
    """Run the fused plane kernel over a (C, Hh, W, D) half spectrum.

    ``wparams`` is (C, 5) — the weight-stage scalars repeated per channel.
    """
    run = _plane_pallas(tuple(spatial), tuple(flags), precision, interpret)
    return run(k_re, k_im, wparams, locs, vals, gates, conjs, scales)


def stylize_kspace_plane(x: Array, key: jax.Array, cfg) -> Array:
    """Plane-kernel execution of the ``stylize_kspace`` contract.

    Dispatch target of ``StylizeConfig.fft_backend in ("plane",
    "plane_fast")`` when :func:`plane_kernel_eligible` holds. Consumes the
    identical ``stage_keys`` streams, so all sampled parameters match the
    reference path bit-for-bit; the k-space arithmetic differs only by
    matmul rounding (bf16x3 per dot for "plane", single-pass bf16 for
    "plane_fast"; the H half-axis transforms stay f32-HIGHEST).
    """
    from mvtb_tpu.ops import fused as _f

    nd = cfg.n_dims
    spatial = x.shape[1:]
    C = x.shape[0]
    H, W, D = spatial
    Hh = H // 2 + 1
    rdtype = jnp.zeros((), x.dtype).real.dtype
    ks = _f.stage_keys(key, cfg)
    precision = (jax.lax.Precision.DEFAULT if cfg.fft_backend == "plane_fast"
                 else jax.lax.Precision.HIGH)
    interpret = jax.default_backend() == "cpu"

    # ---- stage draws: IDENTICAL keys/shapes to fused.stylize_kspace ----
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    wp = [zero] * 5
    has_gibbs = cfg.gibbs_alpha is not None
    gibbs_sym = has_gibbs and any(n % 2 == 0 for n in spatial)
    if has_gibbs:
        alpha = _f._sample(ks["gibbs_alpha"], cfg.gibbs_alpha, rdtype)
        r_g = (1.0 - alpha) * max(spatial) * math.sqrt(2.0) / 2.0
        wp[0] = (r_g * r_g).astype(jnp.float32)
        wp[1] = _f._gate(ks["gibbs_gate"], cfg.gibbs_prob).astype(jnp.float32)
    has_disk = cfg.disk_r is not None
    if has_disk:
        r_d = _f._sample(ks["disk_r"], cfg.disk_r, rdtype)
        wp[2] = (r_d * r_d).astype(jnp.float32)
        wp[3] = _f._gate(ks["disk_gate"], cfg.disk_prob).astype(jnp.float32)
    has_wrap = cfg.wrap_alpha is not None
    wrap_alpha_val = None
    if has_wrap:
        alpha_w = _f._sample(ks["wrap_alpha"], cfg.wrap_alpha, rdtype)
        g_w = _f._gate(ks["wrap_gate"], cfg.wrap_prob)
        wrap_alpha_val = jnp.where(g_w, alpha_w, jnp.ones((), rdtype))
        wp[4] = wrap_alpha_val.astype(jnp.float32)
    wparams = jnp.broadcast_to(jnp.stack(wp)[None, :], (C, 5))

    def wrap_at(shifted):
        f = jnp.ones((), rdtype)
        if wrap_alpha_val is None:
            return f
        for d in range(nd):
            f = f * jnp.where(shifted[d] % 2 == 1, wrap_alpha_val,
                              jnp.ones((), rdtype))
        return f

    # point-write stages, spike first then plane (reference order)
    stage_locs, stage_vals, stage_gates = [], [], []
    if cfg.spike:
        lo = jnp.full((C,), cfg.spike_range[0], rdtype)
        hi = jnp.full((C,), cfg.spike_range[1], rdtype)
        loc_keys = jax.random.split(ks["spike_loc"], nd)
        if cfg.spike_channel_wise:
            shifted = tuple(
                jax.random.randint(loc_keys[d], (C,), 0, spatial[d])
                for d in range(nd))
            vals_s = lo + (hi - lo) * jax.random.uniform(
                ks["spike_val"], (C,), rdtype)
            gates_s = jax.random.bernoulli(
                ks["spike_gate"], cfg.spike_prob, (C,))
        else:
            scalar_shifted = tuple(
                jax.random.randint(loc_keys[d], (), 0, spatial[d])
                for d in range(nd))
            shifted = tuple(jnp.full((C,), s) for s in scalar_shifted)
            u = jax.random.uniform(ks["spike_val"], (), rdtype)
            vals_s = jnp.broadcast_to(lo + (hi - lo) * u, (C,))
            gates_s = jnp.full((C,), _f._gate(ks["spike_gate"],
                                              cfg.spike_prob))
        raw = tuple(_f._to_raw_index(shifted[d], spatial[d])
                    for d in range(nd))
        stage_locs.append(raw)
        stage_vals.append(jnp.exp(vals_s) * wrap_at(shifted))
        stage_gates.append(gates_s)
    if cfg.plane_axes is not None:
        a, b, c3 = cfg.plane_axes
        shell = jnp.asarray(ellipsoid_shell_mask(spatial, a, b, c3).ravel())
        logits = jnp.where(shell, 0.0, -jnp.inf)
        flat = jax.random.categorical(ks["plane_loc"], logits)
        loc = jnp.unravel_index(flat, spatial)
        raw = tuple(jnp.full((C,), _f._to_raw_index(loc[d], spatial[d]))
                    for d in range(nd))
        g = _f._gate(ks["plane_gate"], cfg.plane_prob)
        stage_locs.append(raw)
        stage_vals.append(jnp.full((C,), jnp.exp(
            jnp.asarray(cfg.plane_intensity, rdtype))) * wrap_at(loc))
        stage_gates.append(jnp.full((C,), g))

    n_stages = len(stage_locs)
    if n_stages:
        locs_l, conjs_l, scales_l = [], [], []
        for raw in stage_locs:
            in_half = raw[0] < Hh  # canonical iff the H index is stored
            canon = tuple(jnp.where(in_half, raw[d],
                                    (spatial[d] - raw[d]) % spatial[d])
                          for d in range(nd))
            z_self = (canon[0] == 0) | (2 * canon[0] == H)
            locs_l.append(jnp.stack(canon, axis=-1).astype(jnp.int32))
            conjs_l.append(jnp.where(in_half, 1.0, -1.0)
                           .astype(jnp.float32))
            scales_l.append(jnp.where(z_self, 1.0, 0.5).astype(jnp.float32))
        locs = jnp.stack(locs_l)                       # (S, C, 3)
        vals = jnp.stack(stage_vals).astype(jnp.float32)
        gates = jnp.stack(stage_gates).astype(jnp.float32)
        conjs = jnp.stack(conjs_l)
        scales = jnp.stack(scales_l)
    else:
        locs = jnp.zeros((1, C, 3), jnp.int32)
        vals = jnp.zeros((1, C), jnp.float32)
        gates = jnp.zeros((1, C), jnp.float32)
        conjs = jnp.ones((1, C), jnp.float32)
        scales = jnp.zeros((1, C), jnp.float32)

    flags = (has_gibbs, gibbs_sym, has_disk, cfg.disk_inside_off, has_wrap,
             cfg.spike, cfg.plane_axes is not None)

    # ---- half spectrum on H; fused plane kernel; back to image space ----
    k = _dft.half_dft_axis(x.astype(jnp.float32), axis=1)
    ore, oim = plane_stylize_half(
        k.real, k.imag, spatial, flags, wparams, locs, vals, gates, conjs,
        scales, precision, interpret)
    out = _dft.half_idft_axis_real(jax.lax.complex(ore, oim), n=H, axis=1)
    out = out.astype(x.dtype)

    # ---- image-domain salt & pepper (same draws as stylize_kspace) ----
    if cfg.sap_p is not None:
        p = _f._sample(ks["sap_p"], cfg.sap_p, rdtype)
        g = _f._gate(ks["sap_gate"], cfg.sap_prob)
        p = jnp.where(g, p, jnp.zeros((), rdtype))
        u = jax.random.uniform(ks["sap_u"], out.shape, rdtype)
        lo = out.min() / 2
        hi = out.max() / 2
        styled = jnp.where(u <= p / 2, lo, out)
        out = jnp.where((u > p / 2) & (u <= p), hi, styled)
    return out
