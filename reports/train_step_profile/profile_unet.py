"""Per-op breakdown, batch-scaling curve, and optimization experiments for
the 3D UNet train step (VERDICT round-2 item 1).

The reference spends ~100% of an experiment's wall-clock in this step
(``/root/reference/10_scripts/20_Gibbs_filters/baseline.py:232-248`` hot
loop, 180 epochs x ~194 steps); round 2 measured it at 78.5 ms/batch-4
(~1% of v5e bf16 peak) and asserted "the headroom is architectural" from a
FLOP count alone. This script earns that claim (or refutes it) the way the
DFT work was earned: measured stage/op attribution by ablation, a batch
scaling curve, and concrete optimization experiments (norm/act fusion
variants, pixel-shuffle upsampling to replace transposed convs, remat).

All timings use the device-loop slope method (see bench.py: the tunnel's
``block_until_ready`` does not block; a fori_loop with a loop-carried dep
timed at two static iteration counts isolates per-iteration device time
from dispatch/fetch overhead). Run stages separately (one TPU process at a
time, compiles are slow):

    python reports/train_step_profile/profile_unet.py breakdown
    python reports/train_step_profile/profile_unet.py batch
    python reports/train_step_profile/profile_unet.py ablate
    python reports/train_step_profile/profile_unet.py shuffle
    python reports/train_step_profile/profile_unet.py remat
    python reports/train_step_profile/profile_unet.py trace

Each stage prints JSON lines; collected results land in RESULTS.md.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn  # noqa: E402
import optax  # noqa: E402

from mvtb_tpu.models import unet3d  # noqa: E402
from mvtb_tpu.ops.fused import StylizeConfig, stylize_batch  # noqa: E402
from mvtb_tpu.train.losses import dice_loss  # noqa: E402
from mvtb_tpu.train.seg import reference_optimizer  # noqa: E402

SP = (128, 128, 64)
CFG = StylizeConfig(disk_r=(10.0, 25.0), sap_p=0.05)  # config-4 augmentation
TX = reference_optimizer()


def emit(**kv):
    print(json.dumps(kv), flush=True)


def data(B: int):
    img = jnp.asarray(np.random.RandomState(0).randn(B, 4, *SP), np.float32)
    lbl = jnp.asarray((np.random.RandomState(1).rand(B, 3, *SP) > 0.8),
                      np.float32)
    return img, lbl


def init_params(model, B: int = 1):
    return jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((B,) + SP + (4,), jnp.float32))["params"]


def slope_ms(fn, args, lo=2, hi=10):
    """ms/iter of ``fn(i, *args) -> f32 scalar`` (must keep all work live)."""

    def run(k, *a):
        def body(i, acc):
            return fn(i + (acc * 0).astype(jnp.int32), *a)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    runj = jax.jit(run, static_argnums=0)
    float(runj(lo, *args))
    float(runj(hi, *args))

    def t(k):
        t0 = time.perf_counter()
        float(runj(k, *args))
        return time.perf_counter() - t0

    return (min(t(hi), t(hi)) - min(t(lo), t(lo))) / (hi - lo) * 1e3


def grad_sum(tree):
    return sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(tree))


def full_step_ms(model, B: int, cfg, lo=2, hi=8):
    """ms/step of the donated train step (stylize + fwd + bwd + Adam)."""
    params = init_params(model)
    opt_state = jax.jit(TX.init)(params)
    img, lbl = data(B)

    def run(k, params, opt_state, img, lbl):
        def body(i, carry):
            params, opt_state = carry
            x = img
            if cfg is not None and cfg.any_enabled:
                key = jax.random.fold_in(jax.random.key(0), i)
                x = stylize_batch(img, key, cfg)
            else:
                x = img.at[0, 0, 0, 0, 0].set(i.astype(jnp.float32))

            def loss_fn(p):
                logits = model.apply({"params": p}, jnp.moveaxis(x, 1, -1))
                return dice_loss(logits, jnp.moveaxis(lbl, 1, -1))

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = TX.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state)

        p, _ = jax.lax.fori_loop(0, k, body, (params, opt_state))
        return jax.tree.leaves(p)[0].ravel()[0].astype(jnp.float32)

    runj = jax.jit(run, static_argnums=0)
    float(runj(lo, params, opt_state, img, lbl))
    float(runj(hi, params, opt_state, img, lbl))

    def t(k):
        t0 = time.perf_counter()
        float(runj(k, params, opt_state, img, lbl))
        return time.perf_counter() - t0

    return (min(t(hi), t(hi)) - min(t(lo), t(lo))) / (hi - lo) * 1e3


def fwd_bwd_ms(model, B: int, lo=2, hi=8):
    """ms/iter of value_and_grad alone (all grad leaves kept live)."""
    params = init_params(model)
    img, lbl = data(B)

    def fn(i, params, img, lbl):
        x = img.at[0, 0, 0, 0, 0].set(i.astype(jnp.float32))

        def loss_fn(p):
            logits = model.apply({"params": p}, jnp.moveaxis(x, 1, -1))
            return dice_loss(logits, jnp.moveaxis(lbl, 1, -1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss.astype(jnp.float32) + grad_sum(grads)

    return slope_ms(fn, (params, img, lbl), lo, hi)


# ---------------------------------------------------------------- variants

def make_conv(with_norm=True, with_act=True, bf16_stats=False,
              bf16_act=False, slab=False, k331=False):
    """ConvNormAct variant with norm/act/conv ablation+optimization switches.

    ``bf16_stats=True`` swaps flax GroupNorm (which always computes stats in
    f32) for a one-pass all-bf16 instance norm. ``bf16_act=True`` applies
    PReLU with the learned slope cast to the compute dtype (flax's f32 slope
    promotes the whole tensor to f32, inserting full-size converts between
    every block). ``slab=True`` decomposes stride-1 k3 convs into 3 2D convs
    over (B*D) slabs; ``k331=True`` into 3 (3,3,1) convs on D-shifted inputs
    (no layout moves) — both exact reformulations of the same conv.
    """

    class Conv(nn.Module):
        features: int
        strides: int = 1
        kernel_size: int = 3
        transposed: bool = False
        conv_only: bool = False
        dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, x):
            nd = x.ndim - 2
            k = (self.kernel_size,) * nd
            s = (self.strides,) * nd
            if self.transposed:
                x = nn.ConvTranspose(self.features, k, s, padding="SAME",
                                     dtype=self.dtype)(x)
            elif (slab or k331) and self.strides == 1 and nd == 3 \
                    and self.kernel_size == 3:
                cin = x.shape[-1]
                w = self.param(
                    "slab_kernel", nn.initializers.lecun_normal(),
                    (3, 3, 3, cin, self.features), jnp.float32)
                b = self.param("slab_bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                xd = x.astype(self.dtype)
                wd = w.astype(self.dtype)
                B, H, W, D, C = xd.shape
                if slab:
                    xs = jnp.moveaxis(xd, 3, 1).reshape(B * D, H, W, C)
                    parts = []
                    for dz in range(3):
                        y = jax.lax.conv_general_dilated(
                            xs, wd[:, :, dz], (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        parts.append(y.reshape(B, D, H, W, self.features))
                    out = parts[1]
                    zero = jnp.zeros_like(parts[0][:, :1])
                    out = out + jnp.concatenate([parts[2][:, 1:], zero], 1)
                    out = out + jnp.concatenate([zero, parts[0][:, :-1]], 1)
                    x = jnp.moveaxis(out, 1, 3)
                else:  # k331: D-tap sum of (3,3,1) convs on shifted inputs
                    out = None
                    for dz in range(3):
                        y = jax.lax.conv_general_dilated(
                            xd, wd[:, :, dz:dz + 1], (1, 1, 1), "SAME",
                            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
                        off = dz - 1
                        if off == 1:
                            zero = jnp.zeros_like(y[:, :, :, :1])
                            y = jnp.concatenate([y[:, :, :, 1:], zero], 3)
                        elif off == -1:
                            zero = jnp.zeros_like(y[:, :, :, :1])
                            y = jnp.concatenate([zero, y[:, :, :, :-1]], 3)
                        out = y if out is None else out + y
                    x = out
                x = x + b.astype(self.dtype)
            else:
                x = nn.Conv(self.features, k, s, padding="SAME",
                            dtype=self.dtype)(x)
            if not self.conv_only:
                if with_norm and bf16_stats:
                    red = tuple(range(1, x.ndim - 1))
                    mu = jnp.mean(x, axis=red, keepdims=True)
                    var = jnp.mean(x * x, axis=red, keepdims=True) - mu * mu
                    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
                elif with_norm:
                    x = nn.GroupNorm(num_groups=None, group_size=1,
                                     epsilon=1e-5, use_bias=False,
                                     use_scale=False, dtype=self.dtype)(x)
                if with_act:
                    if bf16_act:
                        slope = self.param("prelu_slope",
                                           nn.initializers.constant(0.25),
                                           (), jnp.float32)
                        sl = slope.astype(x.dtype)
                        x = jnp.where(x >= 0, x, sl * x)
                    else:
                        x = nn.PReLU(negative_slope_init=0.25)(x)
            return x

    return Conv


class ShuffleUpConv(nn.Module):
    """Transposed-conv replacement: dense conv at the LOW resolution emitting
    ``2**nd`` output phases, then depth-to-space. Same upsample topology as
    ConvTranspose(k=3, s=2, SAME) but the GEMM runs with an 8x larger N
    dimension (features*8 output channels) and never multiplies the dilated
    zeros — the classic MXU-occupancy reshape for small-channel upsampling.
    """

    features: int
    strides: int = 2
    kernel_size: int = 3
    transposed: bool = True  # signature-compat; always the shuffle path
    conv_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        r = self.strides
        if r == 1:
            y = nn.Conv(self.features, (self.kernel_size,) * nd,
                        (1,) * nd, padding="SAME", dtype=self.dtype)(x)
        else:
            y = nn.Conv(self.features * r ** nd, (2,) * nd, (1,) * nd,
                        padding="SAME", dtype=self.dtype)(x)
            B = y.shape[0]
            sp = y.shape[1:-1]
            y = y.reshape((B,) + tuple(sp) + (r,) * nd + (self.features,))
            # interleave phase axes: (B, s1, r, s2, r, s3, r, F)
            perm = [0]
            for d in range(nd):
                perm += [1 + d, 1 + nd + d]
            perm += [1 + 2 * nd]
            y = y.transpose(perm)
            y = y.reshape((B,) + tuple(s * r for s in sp) + (self.features,))
        if not self.conv_only:
            y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             use_bias=False, use_scale=False,
                             dtype=self.dtype)(y)
            y = nn.PReLU(negative_slope_init=0.25)(y)
        return y


@contextlib.contextmanager
def patched(**names):
    """Temporarily replace module-level names in ``unet3d``."""
    orig = {k: getattr(unet3d, k) for k in names}
    for k, v in names.items():
        setattr(unet3d, k, v)
    try:
        yield
    finally:
        for k, v in orig.items():
            setattr(unet3d, k, v)


class ShuffleUNet(unet3d.UNet):
    """UNet whose up path uses ShuffleUpConv instead of ConvTranspose."""

    def _up(self, x, features, strides, is_top):
        conv_only = is_top and self.num_res_units == 0
        x = ShuffleUpConv(features, strides, conv_only=conv_only,
                          dtype=self.dtype)(x)
        if self.num_res_units > 0:
            x = unet3d.ResidualUnit(features, 1, subunits=1,
                                    last_conv_only=is_top,
                                    dtype=self.dtype)(x)
        return x


# ------------------------------------------------------------------ stages

def stage_breakdown():
    B = 4
    model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
    params = init_params(model)
    img, lbl = data(B)

    def aug(i, img):
        key = jax.random.fold_in(jax.random.key(0), i)
        return jnp.sum(stylize_batch(img, key, CFG)).astype(jnp.float32)

    emit(stage="breakdown", name="aug_only", B=B,
         ms=slope_ms(aug, (img,), 2, 12))

    def fwd(i, params, img):
        x = img.at[0, 0, 0, 0, 0].set(i.astype(jnp.float32))
        logits = model.apply({"params": params}, jnp.moveaxis(x, 1, -1))
        return jnp.sum(logits).astype(jnp.float32)

    emit(stage="breakdown", name="fwd_only", B=B,
         ms=slope_ms(fwd, (params, img), 2, 10))

    def fwd_loss(i, params, img, lbl):
        x = img.at[0, 0, 0, 0, 0].set(i.astype(jnp.float32))
        logits = model.apply({"params": params}, jnp.moveaxis(x, 1, -1))
        return dice_loss(logits, jnp.moveaxis(lbl, 1, -1)).astype(jnp.float32)

    emit(stage="breakdown", name="fwd_loss", B=B,
         ms=slope_ms(fwd_loss, (params, img, lbl), 2, 10))

    emit(stage="breakdown", name="fwd_bwd", B=B, ms=fwd_bwd_ms(model, B))
    emit(stage="breakdown", name="step_noaug", B=B,
         ms=full_step_ms(model, B, None))
    emit(stage="breakdown", name="step_full", B=B,
         ms=full_step_ms(model, B, CFG))


def stage_batch():
    model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
    for B in (1, 2, 4, 8, 16):
        ms = full_step_ms(model, B, CFG)
        emit(stage="batch", B=B, ms=ms, vol_per_sec=B * 1e3 / ms)


def stage_ablate():
    B = 4
    for name, kw in [
        ("base_bf16", None),
        ("no_norm", dict(with_norm=False)),
        ("no_act", dict(with_act=False)),
        ("conv_only", dict(with_norm=False, with_act=False)),
        ("bf16_stats_norm", dict(bf16_stats=True)),
    ]:
        if kw is None:
            model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
            emit(stage="ablate", name=name, B=B, ms=fwd_bwd_ms(model, B))
        else:
            with patched(ConvNormAct=make_conv(**kw)):
                model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
                emit(stage="ablate", name=name, B=B, ms=fwd_bwd_ms(model, B))
    model = unet3d.UNet(out_channels=3, dtype=jnp.float32)
    emit(stage="ablate", name="f32", B=B, ms=fwd_bwd_ms(model, B))


def stage_shuffle():
    B = 4
    model = ShuffleUNet(out_channels=3, dtype=jnp.bfloat16)
    emit(stage="shuffle", name="shuffle_fwd_bwd", B=B, ms=fwd_bwd_ms(model, B))
    ms = full_step_ms(model, B, CFG)
    emit(stage="shuffle", name="shuffle_step_full", B=B, ms=ms,
         vol_per_sec=B * 1e3 / ms)


def stage_remat():
    B = 4

    class RematUNet(unet3d.UNet):
        def _down(self, x, features, strides):
            if self.num_res_units > 0:
                return nn.remat(unet3d.ResidualUnit)(
                    features, strides, subunits=self.num_res_units,
                    dtype=self.dtype)(x)
            return unet3d.ConvNormAct(features, strides, dtype=self.dtype)(x)

    model = RematUNet(out_channels=3, dtype=jnp.bfloat16)
    ms = full_step_ms(model, B, CFG)
    emit(stage="remat", name="remat_down_path", B=B, ms=ms)


def stage_trace():
    """Try a real jax.profiler device trace of the full step; parse the
    xplane with tensorboard_plugin_profile if the tunnel runtime recorded
    device events."""
    import glob
    import os

    B = 4
    model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
    params = init_params(model)
    opt_state = jax.jit(TX.init)(params)
    img, lbl = data(B)

    @jax.jit
    def step(params, opt_state, img, lbl, key):
        x = stylize_batch(img, key, CFG)

        def loss_fn(p):
            logits = model.apply({"params": p}, jnp.moveaxis(x, 1, -1))
            return dice_loss(logits, jnp.moveaxis(lbl, 1, -1))

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = TX.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # warm up (compile outside the trace)
    params2, opt2 = step(params, opt_state, img, lbl, jax.random.key(0))
    float(jax.tree.leaves(params2)[0].ravel()[0])

    logdir = "/tmp/mvtb_trace"
    jax.profiler.start_trace(logdir)
    p, o = params, opt_state
    for i in range(4):
        p, o = step(p, o, img, lbl, jax.random.key(i))
    float(jax.tree.leaves(p)[0].ravel()[0])
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    emit(stage="trace", xplane_files=xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data_bytes, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
        out = "/tmp/mvtb_trace/op_profile.json"
        with open(out, "wb") as f:
            f.write(data_bytes if isinstance(data_bytes, bytes)
                    else data_bytes.encode())
        emit(stage="trace", op_profile=out)
    except Exception as e:  # pragma: no cover - best effort
        emit(stage="trace", parse_error=repr(e))


def _conv3d_ms(B, sp, cin, cout, stride=1, dtype=jnp.bfloat16):
    """Single XLA 3D conv, channel-last, kernel 3, SAME."""
    x = jnp.asarray(np.random.RandomState(0).randn(B, *sp, cin), dtype)
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, cin, cout) * 0.1,
                    dtype)

    def fn(i, x, w):
        xi = x.at[0, 0, 0, 0, 0].set(i.astype(dtype))
        y = jax.lax.conv_general_dilated(
            xi, w, (stride,) * 3, "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
        return jnp.sum(y).astype(jnp.float32)

    return slope_ms(fn, (x, w), 2, 12)


def _conv2d_slab_ms(B, sp, cin, cout, dtype=jnp.bfloat16):
    """Same 3D k3 s1 conv decomposed into 3 2D convs over (B*D) slabs:
    out[..., d, :] = sum_dz conv2d(x[..., d+dz, :], w[:, :, dz]) — folds the
    depth axis into the batch so XLA's 2D conv path does the work, with two
    shifted adds stitching the depth taps."""
    H, W, D = sp
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, D, cin), dtype)
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, cin, cout) * 0.1,
                    dtype)

    def fn(i, x, w):
        xi = x.at[0, 0, 0, 0, 0].set(i.astype(dtype))
        # (B, H, W, D, C) -> (B*D, H, W, C)
        xs = jnp.moveaxis(xi, 3, 1).reshape(B * D, H, W, cin)
        parts = []
        for dz in range(3):
            y = jax.lax.conv_general_dilated(
                xs, w[:, :, dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            parts.append(y.reshape(B, D, H, W, cout))
        # depth tap dz applies to out[d] from in[d + dz - 1]
        out = parts[1]
        zero = jnp.zeros_like(parts[0][:, :1])
        out = out + jnp.concatenate([parts[2][:, 1:], zero], axis=1)
        out = out + jnp.concatenate([zero, parts[0][:, :-1]], axis=1)
        out = jnp.moveaxis(out, 1, 3)
        return jnp.sum(out).astype(jnp.float32)

    return slope_ms(fn, (x, w), 2, 12)


def _gemm_ms(M, K, N, dtype=jnp.bfloat16):
    """Equivalent-FLOP plain GEMM (the MXU reference point)."""
    a = jnp.asarray(np.random.RandomState(0).randn(M, K), dtype)
    b = jnp.asarray(np.random.RandomState(1).randn(K, N), dtype)

    def fn(i, a, b):
        ai = a.at[0, 0].set(i.astype(dtype))
        return jnp.sum(jnp.dot(ai, b)).astype(jnp.float32)

    return slope_ms(fn, (a, b), 2, 12)


def stage_micro():
    """Per-level conv microbenchmarks: XLA 3D conv vs 2D-slab decomposition
    vs equivalent-FLOP GEMM, with achieved TFLOP/s."""
    B = 4
    levels = [
        ("L1_16ch_64x64x32", (64, 64, 32), 16, 16),
        ("L2_32ch_32x32x16", (32, 32, 16), 32, 32),
        ("L3_64ch_16x16x8", (16, 16, 8), 64, 64),
        ("bottom_256ch_8x8x4", (8, 8, 4), 256, 256),
    ]
    for name, sp, cin, cout in levels:
        pos = B * sp[0] * sp[1] * sp[2]
        gflop = 2 * pos * cin * 27 * cout / 1e9
        ms3 = _conv3d_ms(B, sp, cin, cout)
        ms2 = _conv2d_slab_ms(B, sp, cin, cout)
        msg = _gemm_ms(pos, cin * 27, cout)
        emit(stage="micro", name=name, gflop=round(gflop, 2),
             conv3d_ms=ms3, conv3d_tflops=round(gflop / ms3, 1),
             slab2d_ms=ms2, slab2d_tflops=round(gflop / ms2, 1),
             gemm_ms=msg, gemm_tflops=round(gflop / msg, 1))
    # the full-res first conv (stride 2, 4 -> 16)
    ms = _conv3d_ms(B, (128, 128, 64), 4, 16, stride=2)
    emit(stage="micro", name="first_conv_s2_4to16", conv3d_ms=ms)


def stage_opt2():
    """Optimization variants informed by the ablation + micro stages:
    all-bf16 fused norm+act (kill the f32 stat/PReLU promotions and their
    full-tensor converts), slab/k331 conv reformulations, and the combined
    best — fwd_bwd plus a full donated step for the winner."""
    B = 4
    variants = [
        ("norm_act_bf16", dict(bf16_stats=True, bf16_act=True)),
        ("slab_convs", dict(slab=True)),
        ("k331_convs", dict(k331=True)),
        ("norm_act_bf16_slab", dict(bf16_stats=True, bf16_act=True,
                                    slab=True)),
    ]
    for name, kw in variants:
        with patched(ConvNormAct=make_conv(**kw)):
            model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
            emit(stage="opt2", name=name, B=B, ms=fwd_bwd_ms(model, B))
    best = dict(bf16_stats=True, bf16_act=True)
    with patched(ConvNormAct=make_conv(**best)):
        model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
        ms = full_step_ms(model, B, CFG)
        emit(stage="opt2", name="norm_act_bf16_step_full", B=B, ms=ms,
             vol_per_sec=B * 1e3 / ms)


def stage_opt3():
    """Variance re-check of the opt2 winners + full donated steps + batch 8:
    slab convs alone vs slab + all-bf16 norm/act, twice each."""
    B = 4
    for rep in range(2):
        for name, kw in [("slab_convs", dict(slab=True)),
                         ("norm_act_bf16_slab", dict(bf16_stats=True,
                                                     bf16_act=True,
                                                     slab=True))]:
            with patched(ConvNormAct=make_conv(**kw)):
                model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
                emit(stage="opt3", name=f"{name}_rep{rep}", B=B,
                     ms=fwd_bwd_ms(model, B))
    for name, kw in [("slab_step_full", dict(slab=True)),
                     ("slab_bf16norm_step_full", dict(bf16_stats=True,
                                                      bf16_act=True,
                                                      slab=True))]:
        with patched(ConvNormAct=make_conv(**kw)):
            model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
            ms = full_step_ms(model, B, CFG)
            emit(stage="opt3", name=name, B=B, ms=ms,
                 vol_per_sec=B * 1e3 / ms)
    with patched(ConvNormAct=make_conv(slab=True)):
        model = unet3d.UNet(out_channels=3, dtype=jnp.bfloat16)
        ms = full_step_ms(model, 8, CFG)
        emit(stage="opt3", name="slab_step_full_b8", B=8, ms=ms,
             vol_per_sec=8 * 1e3 / ms)


STAGES = {
    "breakdown": stage_breakdown,
    "opt2": stage_opt2,
    "opt3": stage_opt3,
    "batch": stage_batch,
    "ablate": stage_ablate,
    "shuffle": stage_shuffle,
    "remat": stage_remat,
    "micro": stage_micro,
    "trace": stage_trace,
}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["breakdown"]):
        STAGES[name]()
