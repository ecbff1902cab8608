"""End-to-end smoke: every experiment kind runs a few steps, losses are
finite and decrease where expected, stylization params actually move."""

import dataclasses

import jax
import numpy as np
import pytest

from mvtb_tpu.experiments import ExperimentConfig, run
from mvtb_tpu.ops.fused import StylizeConfig

TINY = dict(channels=(4, 8, 16), strides=(2, 2), spatial=(16, 16, 8),
            batch_size=2, val_interval=1)


def test_segmentation_baseline_smoke(tmp_path):
    cfg = ExperimentConfig(name="baseline_smoke", in_channels=4,
                           out_channels=3, **TINY)
    out = run(cfg, epochs=2, steps_per_epoch=3, workdir=str(tmp_path),
              verbose=False)
    losses = out["history"]["loss"]
    assert len(losses) == 2 and all(np.isfinite(losses))
    assert out["best_dice"] > 0
    assert (tmp_path / "baseline_smoke_result.json").exists()
    assert (tmp_path / "ckpt").exists()


def test_segmentation_with_stylization_smoke():
    sty = StylizeConfig(disk_r=4.0, disk_prob=1.0, sap_p=0.05)
    cfg = ExperimentConfig(name="gibbs_smoke", in_channels=1, out_channels=1,
                           train_stylize=sty, val_stylize=sty,
                           select_channel=(0, 1), **TINY)
    out = run(cfg, epochs=1, steps_per_epoch=3, verbose=False)
    assert np.isfinite(out["history"]["loss"][0])


def test_learnable_gibbs_grad_mode_moves_alpha():
    cfg = ExperimentConfig(name="gibbs_layer_smoke", kind="learnable_gibbs",
                           in_channels=1, out_channels=1, alpha0=0.7,
                           fd_mode=False, **TINY)
    out = run(cfg, epochs=1, steps_per_epoch=4, verbose=False)
    traj = out["trajectory"]
    assert len(traj) == 4 and all(np.isfinite(traj))
    assert any(abs(a - 0.7) > 1e-6 for a in traj), "alpha never moved"


def test_learnable_gibbs_fd_mode_matches_reference_rule():
    cfg = ExperimentConfig(name="gibbs_fd_smoke", kind="learnable_gibbs",
                           in_channels=1, out_channels=1, alpha0=0.7,
                           fd_mode=True, fd_h=0.01, fd_lr=0.02, **TINY)
    out = run(cfg, epochs=1, steps_per_epoch=2, verbose=False)
    assert all(np.isfinite(out["trajectory"]))


def test_learnable_spikes_intensity_trains():
    cfg = ExperimentConfig(name="spikes_layer_smoke", kind="learnable_spikes",
                           in_channels=1, out_channels=1,
                           spike_intensity=8.0, **TINY)
    out = run(cfg, epochs=1, steps_per_epoch=3, verbose=False)
    traj = out["trajectory"]
    assert all(np.isfinite(traj))
    assert any(abs(i - 8.0) > 1e-7 for i in traj), "intensity never moved"


@pytest.mark.parametrize("kind", ["dcgan", "recon_gan", "recon_gan_freq",
                                  "gibbs_gan"])
def test_gan_smoke(kind):
    cfg = ExperimentConfig(name=f"{kind}_smoke", kind=kind,
                           in_channels=(1 if kind == "dcgan" else 2),
                           spatial=(128, 128), batch_size=2, nz=16)
    out = run(cfg, epochs=1, steps_per_epoch=2, verbose=False)
    assert all(np.isfinite(out["history"]["g_loss"]))
    assert all(np.isfinite(out["history"]["d_loss"]))


def test_checkpoint_roundtrip(tmp_path):
    from mvtb_tpu.models import UNet
    from mvtb_tpu.train import create_seg_state
    from mvtb_tpu.train.checkpoint import CheckpointManager

    model = UNet(out_channels=1, channels=(4, 8), strides=(2,), num_res_units=1)
    state = create_seg_state(jax.random.key(0), model, (1, 8, 8, 8, 1))
    mgr = CheckpointManager(str(tmp_path / "ck"), best_metric="m")
    mgr.save(1, state, metrics={"m": 0.5})
    mgr.wait()
    restored = mgr.restore(state)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.best_step == 1
    mgr.close()


def test_domain_experiment_smoke(tmp_path):
    from mvtb_tpu.experiments import run_domain_experiment

    cfg = ExperimentConfig(name="domain_smoke", in_channels=1, out_channels=1,
                           spatial=(16, 16, 8), channels=(4, 8), strides=(2,),
                           batch_size=2)
    out = run_domain_experiment(cfg, epochs=1, steps_per_epoch=2,
                                n_per_hospital=4, workdir=str(tmp_path),
                                verbose=False)
    assert set(out["eval_dict"]) == {"hospital_A", "hospital_B", "hospital_C",
                                     "holdout"}
    assert np.isfinite(out["gap"]["normalized_gap"])
    assert (tmp_path / "domain_smoke_gap.json").exists()


def test_stylized_loader_applies_config():
    from mvtb_tpu.data import Loader, StylizedLoader
    from mvtb_tpu.ops import StylizeConfig

    rng = np.random.RandomState(0)
    ds = [{"image": rng.randn(1, 16, 16, 8).astype(np.float32),
           "label": np.ones((1, 16, 16, 8), np.float32)} for _ in range(4)]
    base = Loader(ds, batch_size=2)
    sty = StylizedLoader(base, StylizeConfig(disk_r=3.0, disk_prob=1.0), seed=0)
    assert len(sty) == len(base)
    batches_sty = list(sty)
    batches_raw = list(base)
    assert len(batches_sty) == 2
    for bs, br in zip(batches_sty, batches_raw):
        assert bs["image"].shape == br["image"].shape
        assert not np.allclose(bs["image"], br["image"])  # filter applied
        np.testing.assert_array_equal(bs["label"], br["label"])
    # prob=1 fixed-r disk filtering is deterministic given the seed
    again = list(StylizedLoader(base, StylizeConfig(disk_r=3.0, disk_prob=1.0),
                                seed=0))
    np.testing.assert_allclose(again[0]["image"], batches_sty[0]["image"])


def test_domain_experiment_stylized_val_protocol(tmp_path):
    """Stylized domain configs are evaluated under their own val filtering
    (the reference puts the disk mask in val_transform too —
    gibbs15_domain.py:120-136)."""
    from mvtb_tpu.experiments import run_domain_experiment
    from mvtb_tpu.ops import StylizeConfig

    sty = StylizeConfig(disk_r=3.0, disk_prob=1.0)
    cfg = ExperimentConfig(name="domain_sty_smoke", in_channels=1,
                           out_channels=1, spatial=(16, 16, 8),
                           channels=(4, 8), strides=(2,), batch_size=2,
                           train_stylize=sty, val_stylize=sty)
    out = run_domain_experiment(cfg, epochs=1, steps_per_epoch=2,
                                n_per_hospital=4, workdir=str(tmp_path),
                                verbose=False)
    assert set(out["eval_dict"]) == {"hospital_A", "hospital_B", "hospital_C",
                                     "holdout"}
    assert np.isfinite(out["gap"]["normalized_gap"])


def test_gan_smoke_with_workdir_saves_samples(tmp_path):
    cfg = ExperimentConfig(name="dcgan_grid_smoke", kind="dcgan",
                           in_channels=1, spatial=(128, 128), batch_size=2,
                           nz=16)
    run(cfg, epochs=1, steps_per_epoch=1, workdir=str(tmp_path), verbose=False)
    assert (tmp_path / "samples_dcgan_grid_smoke.png").exists()


def test_device_prefetch_preserves_order():
    import itertools

    from mvtb_tpu.data import device_prefetch

    items = [{"a": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(items), size=2))
    assert len(out) == 5
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o["a"]), items[i]["a"])


def test_learnable_frozen_unet_only_moves_alpha():
    cfg = ExperimentConfig(name="frozen_smoke", kind="learnable_gibbs",
                           in_channels=1, out_channels=1, alpha0=0.7,
                           fd_mode=True, freeze_unet=True, **TINY)
    out = run(cfg, epochs=1, steps_per_epoch=2, verbose=False)
    assert all(np.isfinite(out["trajectory"]))
    state = out["state"]
    # UNet params unchanged from init: verify by re-initializing
    import jax
    from mvtb_tpu.models import GibbsUNet
    from mvtb_tpu.train.learnable import create_learnable_state

    model = GibbsUNet(alpha_init=0.7, hard=True, out_channels=1,
                      channels=TINY["channels"], strides=TINY["strides"])
    fresh = create_learnable_state(jax.random.key(0), model,
                                   (2, 1) + TINY["spatial"],
                                   freeze_unet=True)
    a = jax.tree.leaves(fresh.params["unet"])[0]
    b = jax.tree.leaves(state.params["unet"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
