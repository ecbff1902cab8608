"""Chunked + checkpointed dispatch for the GAN and learnable families
(round-3 VERDICT item 2: these two experiment kinds were per-step
dispatch-bound and had no CheckpointManager — unrunnable at the reference's
110-epoch GD / 200-epoch GAN lengths over the ~0.5 s/step tunnel).

Same contract as the segmentation chunked path (tests/test_chunked_resume.py):
one jitted fori_loop dispatch per epoch, full-resolution per-step curves in
the returned history, Orbax full-state checkpoints, and kill/resume with
continuous curves.
"""

import json
import os

import numpy as np

from mvtb_tpu.experiments.registry import ExperimentConfig
from mvtb_tpu.experiments.runner import run


def _learnable_cfg(name, fd=False):
    return ExperimentConfig(
        name=name, kind="learnable_gibbs", spatial=(16, 16, 8),
        channels=(4, 8), strides=(2,), num_res_units=1, batch_size=2,
        val_interval=2, epochs=4, data_kind="smooth", in_channels=4,
        out_channels=3, alpha0=0.7, fd_mode=fd)


def _gan_cfg(name, kind="dcgan"):
    # both GAN families are hard-wired to 128x128 slices (reference
    # architectures: models/dcgan.py 6-layer ladder; resunet_gan.py D's
    # 8x8 VALID head after 4 stride-2 encoders) — gan_nf=16 keeps the
    # 128x128 forwards cheap on the CPU test host
    return ExperimentConfig(
        name=name, kind=kind, spatial=(128, 128), in_channels=1,
        out_channels=1, batch_size=2, val_interval=2, epochs=4, nz=16,
        gan_nf=16, data_kind="smooth")


def test_learnable_chunked_matches_per_step_trajectory_length(tmp_path):
    res = run(_learnable_cfg("tiny_lrn"), epochs=2, steps_per_epoch=3, seed=0,
              workdir=str(tmp_path / "w"), verbose=False, chunked=True,
              pool=6)
    assert len(res["losses"]) == 2              # per-epoch means
    assert len(res["trajectory"]) == 6          # per-step alphas (2 x 3)
    assert np.isfinite(res["losses"]).all()
    assert np.isfinite(res["trajectory"]).all()
    # joint-grad mode moves alpha every step
    assert len(set(np.round(res["trajectory"], 8))) > 1
    assert os.path.exists(tmp_path / "w" / "history.json")
    assert os.path.exists(tmp_path / "w" / "gibbs_trajectory_tiny_lrn.txt")


def test_learnable_fd_chunked_runs(tmp_path):
    res = run(_learnable_cfg("tiny_lrn_fd", fd=True), epochs=1,
              steps_per_epoch=2, seed=0, workdir=None, verbose=False,
              chunked=True, pool=4)
    assert len(res["trajectory"]) == 2
    assert np.isfinite(res["trajectory"]).all()


def test_spikes_fd_chunked_moves_intensity():
    """fd_mode is honored for the SPIKES family too (round-5: the runner
    used to gate FD to learnable_gibbs, silently running the spikes GD
    configs in grad mode — their registry entries carry the reference's
    h=0.05, lr=0.1)."""
    cfg = ExperimentConfig(
        name="tiny_spk_fd", kind="learnable_spikes", spatial=(16, 16, 8),
        channels=(4, 8), strides=(2,), num_res_units=1, batch_size=2,
        val_interval=2, epochs=1, data_kind="smooth", in_channels=4,
        out_channels=3, spike_intensity=5.0, fd_mode=True, fd_h=0.05,
        fd_lr=0.1)
    res = run(cfg, epochs=1, steps_per_epoch=3, seed=0, workdir=None,
              verbose=False, chunked=True, pool=4)
    traj = np.asarray(res["trajectory"])
    assert traj.shape == (3,) and np.isfinite(traj).all()
    # the FD rule moved the intensity off its 5.0 init
    assert len(set(np.round(traj, 8))) > 1 or abs(traj[-1] - 5.0) > 0


def test_learnable_chunked_kill_resume(tmp_path):
    w = str(tmp_path / "w")
    part = run(_learnable_cfg("tiny_lrn_r"), epochs=2, steps_per_epoch=3,
               seed=0, workdir=w, verbose=False, chunked=True, pool=6)
    resumed = run(_learnable_cfg("tiny_lrn_r"), epochs=4, steps_per_epoch=3,
                  seed=0, workdir=w, verbose=False, chunked=True, pool=6,
                  resume=True)
    assert resumed["resumed_from"] == 2
    assert len(resumed["losses"]) == 4
    assert len(resumed["trajectory"]) == 12
    # pre-kill prefix preserved verbatim
    np.testing.assert_array_equal(resumed["trajectory"][:6],
                                  part["trajectory"])
    with open(os.path.join(w, "history.json")) as f:
        h = json.load(f)
    assert len(h["trajectory"]) == 12 and len(h["loss"]) == 4


def test_dcgan_chunked_per_step_curves(tmp_path):
    res = run(_gan_cfg("tiny_dcgan"), epochs=2, steps_per_epoch=3, seed=0,
              workdir=str(tmp_path / "w"), verbose=False, chunked=True,
              pool=8)
    h = res["history"]
    for k in ("g_loss", "d_loss", "D_x", "D_G_z1", "D_G_z2"):
        assert len(h[k]) == 6, k                # per-step resolution
        assert np.isfinite(h[k]).all(), k
    assert "fid" in res and np.isfinite(res["fid"])
    assert os.path.exists(tmp_path / "w" / "samples_tiny_dcgan.png")


def test_dcgan_chunked_kill_resume(tmp_path):
    w = str(tmp_path / "w")
    cfg = _gan_cfg("tiny_dcgan_r")
    # GAN checkpoints land every max(val_interval, 5) epochs -> use 5-epoch
    # granularity for the drill
    part = run(cfg, epochs=5, steps_per_epoch=2, seed=0, workdir=w,
               verbose=False, chunked=True, pool=8)
    resumed = run(cfg, epochs=7, steps_per_epoch=2, seed=0, workdir=w,
                  verbose=False, chunked=True, pool=8, resume=True)
    assert resumed["resumed_from"] == 5
    h = resumed["history"]
    assert len(h["g_loss"]) == 14
    np.testing.assert_array_equal(h["g_loss"][:10],
                                  part["history"]["g_loss"])


def test_recon_gan_chunked_runs(tmp_path):
    res = run(_gan_cfg("tiny_recon", kind="recon_gan"), epochs=1,
              steps_per_epoch=2, seed=0, workdir=str(tmp_path / "w"),
              verbose=False, chunked=True, pool=8)
    h = res["history"]
    for k in ("g_loss", "d_loss", "adv"):
        assert len(h[k]) == 2 and np.isfinite(h[k]).all(), k


def test_gibbs_gan_chunked_runs():
    res = run(_gan_cfg("tiny_ggan", kind="gibbs_gan"), epochs=1,
              steps_per_epoch=2, seed=0, workdir=None, verbose=False,
              chunked=True, pool=8)
    assert np.isfinite(res["history"]["g_loss"]).all()
