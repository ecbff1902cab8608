"""Per-level ConvTranspose microbenchmark (round-3 VERDICT item 6).

The round-3 profile gave the DOWN-path convs the slab treatment (1.88x on
fwd+bwd) but left ``ConvTranspose`` on the native lowering, justified only
by one losing pixel-shuffle experiment. This script closes the roofline:
per up-level, measure the stride-2 k3 transposed conv as

  a) ``flax nn.ConvTranspose`` (the shipped path),
  b) explicit input-dilated regular conv (``lax.conv_general_dilated`` with
     ``lhs_dilation=2`` on the mirrored kernel — the textbook equivalence),
  c) polyphase decomposition: the 8 output-parity classes are 8 small
     stride-1 convs with {1,2}^3-tap sub-kernels, interleaved — no dilated
     zeros ever materialize, and the 1-tap phases lower to pure matmuls.

(c) is verified element-exact against (a) before timing (the SAME-padding
crop alignment is probed numerically at build time). Timings use the
device-loop slope method; outputs are SUMMED into the carry (a ravel()[0]
carry lets XLA DCE trailing work — round-2 lesson).

    python reports/train_step_profile/upconv_bench.py          # fwd
    python reports/train_step_profile/upconv_bench.py grad     # fwd+bwd

Up-level shapes for the headline ResUNet (B=4, 128x128x64, channels
16..256, strides 2,2,2,2), channel-last (input -> ConvTranspose(out)):
  U4: (8,8,4,384)    -> 64     (cat of down4 128 + bottom 256)
  U3: (16,16,8,128)  -> 32
  U2: (32,32,16,64)  -> 16
  U1: (64,64,32,32)  -> 3     (top level, out_channels)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn  # noqa: E402

B = 4
# (name, spatial, cin, cout, lo, hi): loop counts sized so signal >> the
# tunnel's ~1 ms slope-noise floor even for the sub-0.1 ms small levels
LEVELS = [
    ("U4", (8, 8, 4), 384, 64, 60, 400),
    ("U3", (16, 16, 8), 128, 32, 60, 400),
    ("U2", (32, 32, 16), 64, 16, 20, 140),
    ("U1", (64, 64, 32), 32, 3, 6, 40),
]
DTYPE = jnp.bfloat16


def emit(**kv):
    print(json.dumps(kv), flush=True)


def slope_ms(fn, args, lo=2, hi=12):
    def run(k, *a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    runj = jax.jit(run, static_argnums=0)
    float(runj(lo, *args))
    float(runj(hi, *args))

    def t(k):
        t0 = time.perf_counter()
        float(runj(k, *args))
        return time.perf_counter() - t0

    return (min(t(hi), t(hi)) - min(t(lo), t(lo))) / (hi - lo) * 1e3


# ---- variant (a): flax ConvTranspose ---------------------------------------

def flax_tc(cout):
    return nn.ConvTranspose(cout, (3, 3, 3), (2, 2, 2), padding="SAME",
                            dtype=DTYPE)


# ---- variant (b): input-dilated regular conv -------------------------------

def dilated_apply(kernel, x, flip=False):
    """lhs_dilation=2 regular conv == fractionally-strided conv. flax's
    ``ConvTranspose`` uses ``transpose_kernel=False`` (no mirror), so
    ``flip=False`` is the parity setting; padding probed against flax."""
    w = jnp.flip(kernel, (0, 1, 2)) if flip else kernel
    return jax.lax.conv_general_dilated(
        x.astype(DTYPE), w.astype(DTYPE), (1, 1, 1), [(2, 1)] * 3,
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))


# ---- variant (c): polyphase ------------------------------------------------

def polyphase_apply(kernel, x, crop, flip=True):
    """8-phase decomposition of transposed k3 s2.

    Scatter formulation (kernel taps land at out[2i + t]): even positions m
    take taps (w[2]@x[m-1], w[0]@x[m]) — a 2-tap conv on (1,1)-padded x —
    and odd positions m take w[1]@x[m]. flax's no-mirror convention means
    the scatter runs on the FLIPPED kernel (``flip=True`` is parity). The
    3D product of phases gives 8 convs with sub-kernel sizes in {1,2}^3;
    interleave + crop[c:c+2N]. ``crop``/``flip`` probed against flax.
    """
    if flip:
        kernel = jnp.flip(kernel, (0, 1, 2))
    N = x.shape[1:4]
    cout = kernel.shape[4]
    # pad (1,1) on every axis once; per-phase sources are slices of it
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    outs = {}
    for ph in range(8):
        p = ((ph >> 2) & 1, (ph >> 1) & 1, ph & 1)  # parity per axis
        # even parity: y[m] = x[m-1]*w2 + x[m]*w0, m in [0, N] — a VALID
        # 2-tap conv (taps [w2, w0]) over x padded (1,1), N+1 outputs.
        # odd parity: y[m] = x[m]*w1 — a 1-tap conv over raw x, N outputs.
        sub = kernel
        for ax, par in enumerate(p):
            idx = [2, 0] if par == 0 else [1]
            sub = jnp.take(sub, jnp.array(idx), axis=ax)
        src = xp[tuple(
            [slice(None)] +
            [slice(0, N[ax] + 2) if par == 0 else slice(1, N[ax] + 1)
             for ax, par in enumerate(p)] + [slice(None)])]
        outs[p] = jax.lax.conv_general_dilated(
            src.astype(DTYPE), sub.astype(DTYPE), (1, 1, 1), "VALID",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    # interleave: full axis length = (N+1) + N = 2N+1 per axis
    full = jnp.zeros((x.shape[0],) + tuple(2 * n + 1 for n in N) + (cout,),
                     outs[(0, 0, 0)].dtype)
    for p, y in outs.items():
        full = full.at[(slice(None),) +
                       tuple(slice(par, None, 2) for par in p) +
                       (slice(None),)].set(y)
    return full[(slice(None),) +
                tuple(slice(c, c + 2 * n) for c, n in zip(crop, N)) +
                (slice(None),)]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    rng = np.random.RandomState(0)
    for name, sp, cin, cout, lo, hi in LEVELS:
        x = jnp.asarray(rng.randn(B, *sp, cin).astype(np.float32))
        mod = flax_tc(cout)
        variables = jax.jit(mod.init)(jax.random.key(0), x)
        kernel = variables["params"]["kernel"]  # (3,3,3,cin,cout)
        bias = variables["params"]["bias"]

        ref = jax.jit(lambda v, x: mod.apply(v, x))(variables, x)

        # probe polyphase crop alignment (tiny, one-off); bf16-relative tol
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
        crop = None
        for c in [(0, 0, 0), (1, 1, 1)]:
            got = jax.jit(partial(polyphase_apply, crop=c))(kernel, x) + bias
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                        ref.astype(jnp.float32)))) / scale
            if err < 2e-2:
                crop = c
                break
        # probe dilated-path padding match
        got_d = jax.jit(dilated_apply)(kernel, x) + bias
        err_d = float(jnp.max(jnp.abs(got_d.astype(jnp.float32) -
                                      ref.astype(jnp.float32)))) / scale
        emit(level=name, check="parity", polyphase_crop=crop,
             dilated_rel_err=err_d)

        def live(i, x):
            return x + (i.astype(x.dtype) * 1e-9)

        if mode == "fwd":
            fns = {
                "flax_tc": lambda i, v, x: jnp.sum(
                    mod.apply(v, live(i, x)).astype(jnp.float32)),
                "dilated": lambda i, v, x: jnp.sum(
                    dilated_apply(v["params"]["kernel"],
                                  live(i, x)).astype(jnp.float32)),
            }
            if crop is not None:
                fns["polyphase"] = lambda i, v, x: jnp.sum(
                    polyphase_apply(v["params"]["kernel"], live(i, x),
                                    crop).astype(jnp.float32))
            res = {k: round(slope_ms(f, (variables, x), lo, hi), 4)
                   for k, f in fns.items()}
        else:
            def g(apply):
                def run(i, v, x):
                    def loss(v):
                        return jnp.sum(apply(v, live(i, x)).astype(jnp.float32))

                    l, gr = jax.value_and_grad(loss)(v)
                    return l + sum(jnp.sum(t).astype(jnp.float32)
                                   for t in jax.tree.leaves(gr))

                return run

            fns = {
                "flax_tc": g(lambda v, x: mod.apply(v, x)),
                "dilated": g(lambda v, x: dilated_apply(
                    v["params"]["kernel"], x)),
            }
            if crop is not None:
                fns["polyphase"] = g(lambda v, x: polyphase_apply(
                    v["params"]["kernel"], x, crop))
            res = {k: round(slope_ms(f, (variables, x), lo, hi), 4)
                   for k, f in fns.items()}
        emit(level=name, mode=mode, shape=[B, *sp, cin], cout=cout, **res)


if __name__ == "__main__":
    main()
