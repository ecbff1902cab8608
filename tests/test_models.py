"""Model zoo: shapes, param counts, and forward sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.models import (
    Discriminator,
    Generator,
    GibbsNoiseLayer,
    GibbsUNet,
    ResUnetDiscriminator,
    ResUnetGenerator,
    SpikesUNet,
    UNet,
)


def _n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables))


def test_unet_parameter_count_matches_reference_anchor():
    # BASELINE.md: ~4.8M params for the 4->3 config printed by baseline.py.
    m = UNet(out_channels=3)
    # spatial dims must be divisible by prod(strides)=16, as in the reference
    v = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 4)))
    n = _n_params(v)
    assert 4.6e6 < n < 5.0e6, n


def test_unet_output_shape_2d():
    m = UNet(out_channels=1, channels=(8, 16, 32), strides=(2, 2), num_res_units=2)
    v = m.init(jax.random.key(0), jnp.zeros((2, 32, 32, 1)))
    out = m.apply(v, jnp.zeros((2, 32, 32, 1)))
    assert out.shape == (2, 32, 32, 1)


def test_unet_odd_spatial_dims():
    # stride-2 up/down must restore odd sizes too (SAME padding)
    m = UNet(out_channels=1, channels=(4, 8, 16), strides=(2, 2), num_res_units=1)
    x = jnp.zeros((1, 48, 48, 16, 1))
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == x.shape


def test_gibbs_layer_alpha1_near_identity():
    m = GibbsNoiseLayer(alpha_init=1.0, tau=0.25)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16, 16, 8), jnp.float32)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    # radius = dist_max -> nearly everything kept
    assert float(jnp.abs(out - x).max()) < 0.3


def test_gibbs_layer_alpha_is_trainable_param():
    m = GibbsUNet(alpha_init=0.7, channels=(4, 8, 16), strides=(2, 2))
    x = jnp.zeros((1, 1, 16, 16, 8))
    v = m.init(jax.random.key(0), x)
    assert "alpha" in v["params"]["gibbs"]

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x + 1.0) ** 2)

    g = jax.grad(loss)(v["params"])
    assert np.isfinite(float(g["gibbs"]["alpha"][0]))
    assert abs(float(g["gibbs"]["alpha"][0])) > 0


def test_spikes_unet_forward():
    m = SpikesUNet(intensity=8.0, channels=(4, 8, 16), strides=(2, 2))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 16, 16, 8), jnp.float32)
    v = m.init({"params": jax.random.key(0), "corruption": jax.random.key(1)}, x)
    out = m.apply(v, x, rngs={"corruption": jax.random.key(2)})
    assert out.shape == x.shape


def test_dcgan_shapes():
    g = Generator(nz=100, ngf=16, nc=1)
    z = jnp.zeros((2, 1, 1, 100))
    gv = g.init(jax.random.key(0), z, train=False)
    img = g.apply(gv, z, train=False)
    assert img.shape == (2, 128, 128, 1)
    assert float(jnp.abs(img).max()) <= 1.0

    d = Discriminator(nc=1, ndf=16)
    dv = d.init(jax.random.key(0), img, train=False)
    out = d.apply(dv, img, train=False)
    assert out.shape == (2, 1, 1, 1)


def test_resunet_gan_shapes_and_global_residual():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 2), jnp.float32)
    g = ResUnetGenerator(in_chans=2, nf=4)
    gv = g.init(jax.random.key(0), x)
    out = g.apply(gv, x)
    assert out.shape == x.shape

    g2 = ResUnetGenerator(in_chans=2, nf=4, global_residual=False)
    out2 = g2.apply(g2.init(jax.random.key(0), x), x)
    # without the +x residual the output is tanh-bounded
    assert float(jnp.abs(out2).max()) <= 1.0

    d = ResUnetDiscriminator(nf=4)
    dv = d.init(jax.random.key(0), x)
    assert d.apply(dv, x).shape == (1, 1, 1, 1)


def test_slab_conv_matches_native_conv_exactly():
    """The slab-lowered Conv is an exact reformulation of nn.Conv
    (same params, same SAME zero padding): f32 outputs agree to float
    tolerance on both the slab-eligible and generic paths, and gradients
    flow."""
    import flax.linen as nn

    from mvtb_tpu.models import unet3d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 6, 5).astype(np.float32))
    conv = unet3d.Conv(7, (3, 3, 3), 1)
    v = conv.init(jax.random.key(0), x)
    y = conv.apply(v, x)

    y_native = nn.Conv(7, (3, 3, 3), (1, 1, 1), padding="SAME").apply(
        {"params": v["params"]}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_native),
                               atol=2e-5, rtol=2e-5)
    y_forced = unet3d.Conv(7, (3, 3, 3), 1, slab=False).apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_forced),
                               atol=2e-5, rtol=2e-5)

    # strided (generic path) still matches nn.Conv
    conv_s = unet3d.Conv(4, (3, 3, 3), 2)
    vs = conv_s.init(jax.random.key(1), x)
    ys = conv_s.apply(vs, x)
    ys_native = nn.Conv(4, (3, 3, 3), (2, 2, 2), padding="SAME").apply(
        {"params": vs["params"]}, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_native),
                               atol=2e-5, rtol=2e-5)

    g = jax.grad(lambda p: jnp.sum(conv.apply({"params": p}, x) ** 2))(
        v["params"])
    assert all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(g))


def test_unet_param_paths_unchanged_by_slab_conv():
    """The slab Conv keeps nn.Conv's param names/shapes and the class name
    'Conv', so UNet param paths (and old checkpoints) are unchanged."""
    from flax.traverse_util import flatten_dict

    from mvtb_tpu.models import UNet

    model = UNet(out_channels=3, channels=(4, 8), strides=(2,),
                 num_res_units=1)
    v = jax.jit(model.init)(jax.random.key(0),
                            jnp.zeros((1, 16, 16, 16, 4), jnp.float32))
    paths = {"/".join(k) for k in flatten_dict(v["params"])}
    assert any("Conv_0/kernel" in p for p in paths)
    assert all(("kernel" in p) or ("bias" in p) or ("negative_slope" in p)
               for p in paths)
