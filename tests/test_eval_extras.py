"""Sliding-window inference, checkpoint-restored evaluation, plots, slices."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.data.slices import RandConcatd, Sliced
from mvtb_tpu.eval.sliding_window import sliding_window_inference
from mvtb_tpu.models import UNet


def test_sliding_window_matches_direct_when_roi_covers():
    model = UNet(out_channels=2, channels=(4, 8), strides=(2,), num_res_units=1)
    x_cl = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8, 1), jnp.float32)
    v = model.init(jax.random.key(0), x_cl)
    direct = model.apply(v, x_cl)
    sw = sliding_window_inference(jnp.moveaxis(x_cl, -1, 1), (16, 16, 8),
                                  model.apply, v["params"])
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(sw, 1, -1)),
                               np.asarray(direct), atol=1e-5)


def test_sliding_window_tiles_larger_volume():
    model = UNet(out_channels=1, channels=(4, 8), strides=(2,), num_res_units=1)
    roi = (8, 8, 8)
    x_cf = jnp.asarray(np.random.RandomState(1).randn(2, 1, 20, 14, 8), jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1,) + roi + (1,)))
    out = sliding_window_inference(x_cf, roi, model.apply, v["params"],
                                   overlap=0.25)
    assert out.shape == (2, 1, 20, 14, 8)
    assert np.isfinite(np.asarray(out)).all()
    # gaussian blending also runs
    out_g = sliding_window_inference(x_cf, roi, model.apply, v["params"],
                                     mode="gaussian")
    assert np.isfinite(np.asarray(out_g)).all()


def test_sliding_window_constant_equals_tilewise_average():
    """With a linear 'model', overlapping constant blending averages tiles —
    check stitched result equals the input through an identity map."""
    ident = lambda variables, t: t  # noqa: E731
    x_cf = jnp.asarray(np.random.RandomState(2).randn(1, 1, 12, 12, 12), jnp.float32)
    out = sliding_window_inference(x_cf, (8, 8, 8), ident, {}, overlap=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_cf), atol=1e-5)


def test_sliding_window_tile_batch_invariant():
    """Tile batching is a scheduling choice: every ``tile_batch`` (including
    the per-tile value 1 and an over-large one that clamps to T*B) must
    produce the same stitched logits, and match direct forward when one roi
    covers the volume."""
    model = UNet(out_channels=2, channels=(4, 8), strides=(2,), num_res_units=1)
    roi = (8, 8, 8)
    x_cf = jnp.asarray(np.random.RandomState(3).randn(2, 1, 14, 10, 8), jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1,) + roi + (1,)))
    outs = [np.asarray(sliding_window_inference(
        x_cf, roi, model.apply, v["params"], overlap=0.25, tile_batch=tb))
        for tb in (1, 3, 8, 64)]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-5)


def test_model_evaluation_from_checkpoint(tmp_path):
    from mvtb_tpu.eval.harness import ModelEvaluation
    from mvtb_tpu.models import UNet as M
    from mvtb_tpu.train import create_seg_state
    from mvtb_tpu.train.checkpoint import CheckpointManager

    model = M(out_channels=3)
    state = create_seg_state(jax.random.key(0), model, (1, 16, 16, 16, 4))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(5, state)
    mgr.wait()
    mgr.close()

    ev = ModelEvaluation.from_checkpoint(str(tmp_path / "ck"))
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(ev.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plots_write_files(tmp_path):
    from mvtb_tpu.eval.plots import (plot_model_performance,
                                     save_alpha_trajectory,
                                     save_learning_curves,
                                     save_per_class_curves)

    history = {"loss": [0.9, 0.8, 0.7],
               "dice": [{"mean": 0.3, "per_class": [0.2, 0.4, 0.1]},
                        {"mean": 0.5, "per_class": [0.4, 0.6, 0.3]}],
               "epochs": [2, 4]}
    p1 = save_learning_curves(history, str(tmp_path / "curves.png"))
    p2 = save_per_class_curves(history, str(tmp_path / "classes.png"))
    p3 = plot_model_performance(
        {"baseline": {"clean": (0.74, 0.55, 0.78, 0.90), "gibbs9": (0.61,)},
         "gibbs12.5": {"clean": (0.72,), "gibbs9": (0.69,)}},
        str(tmp_path / "bars.png"))
    p4 = save_alpha_trajectory([0.7, 0.68, 0.65], str(tmp_path / "alpha.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_sliced_and_randconcatd():
    rng = np.random.RandomState(0)
    d = {"image": rng.randn(4, 16, 16, 40).astype(np.float32)}
    t = Sliced(keys="image", seed=0)
    out = t(dict(d))
    assert out["image"].shape == (4, 16, 16)

    t2 = RandConcatd(keys="image", seed=0)
    out2 = t2(dict(d))
    assert out2["image"].shape == (2, 16, 16)
    np.testing.assert_array_equal(out2["image"][0], out2["image"][1])
    # slice index in [25, 35)
    c = np.random.RandomState(0).randint(25, 35)
    np.testing.assert_array_equal(out2["image"][0], d["image"][0, :, :, c])


def test_model_evaluation_with_sliding_window_roi():
    from mvtb_tpu.data.synthetic import make_volume
    from mvtb_tpu.eval.harness import ModelEvaluation

    model = UNet(out_channels=1, channels=(4, 8), strides=(2,), num_res_units=1)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    ev = ModelEvaluation(model.apply, v["params"], out_channels=1,
                         roi_size=(8, 8, 8))
    rng = np.random.RandomState(0)
    img, lbl = make_volume(rng, 1, (12, 12, 12), 1)
    batches = [{"image": img[None], "label": lbl[None]}]
    m = ev.dataset_eval_single(iter(batches))
    assert np.isfinite(m)


def test_sliding_window_low_memory_matches_fast_path():
    """The scan-carried low-memory schedule is numerically equivalent to the
    default materialize-all schedule (round-4: fast path restored as the
    default after the low-memory rework measured 1.28x slower on-chip)."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(2, (3, 3, 3), padding="SAME")(x)

    model = Tiny()
    x_cf = jnp.asarray(np.random.RandomState(0)
                       .randn(2, 1, 20, 20, 12).astype(np.float32))
    v = model.init(jax.random.key(0), jnp.moveaxis(x_cf, 1, -1))
    kw = dict(overlap=0.5, mode="gaussian", tile_batch=4)
    fast = sliding_window_inference(x_cf, (8, 8, 8), model.apply,
                                    v["params"], low_memory=False, **kw)
    lowm = sliding_window_inference(x_cf, (8, 8, 8), model.apply,
                                    v["params"], low_memory=True, **kw)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(lowm),
                               rtol=2e-5, atol=2e-5)


def test_per_class_curves_single_channel(tmp_path):
    """1-channel FLAIR configs have one per_class entry — the plot helper
    must not assume the BraTS (TC, WT, ET) triple (round-4 regression:
    crashed AFTER a 19-min reference-scale combo run)."""
    from mvtb_tpu.eval.plots import save_per_class_curves

    history = {"dice": [{"mean": 0.5, "per_class": [0.5]},
                        {"mean": 0.6, "per_class": [0.6]}],
               "epochs": [2, 4], "loss": [1.0, 0.8]}
    p = save_per_class_curves(history, str(tmp_path / "one.png"))
    assert os.path.exists(p)
