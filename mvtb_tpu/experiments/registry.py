"""Experiment registry: the reference's ~90 script clones as configs.

Each entry captures one training script's knobs (SURVEY.md section 2.3 grid).
The reference encodes these as copy-pasted files differing in 1-10 constant
lines (verified by diff in the survey); here one ``ExperimentConfig`` +
:mod:`mvtb_tpu.experiments.runner` replaces each clone. Corruption specs map
onto the fused on-device :class:`~mvtb_tpu.ops.fused.StylizeConfig` — the
TPU path — while remaining expressible as reference dict transforms for
parity runs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from mvtb_tpu.ops.fused import StylizeConfig


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    kind: str = "segmentation"  # segmentation | learnable_gibbs | learnable_spikes
    #                           | dcgan | recon_gan | recon_gan_freq | gibbs_gan
    # model
    in_channels: int = 4
    out_channels: int = 3
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    num_res_units: int = 2
    # "bfloat16" compute is ~1.8x faster on the MXU with f32 params/optimizer;
    # "float32" matches the reference's numerics exactly.
    model_dtype: str = "bfloat16"
    # data
    spatial: Tuple[int, ...] = (128, 128, 64)
    select_channel: Optional[Tuple[int, int]] = None  # (image_chan, label_chan)
    # corruption (fused, on-device)
    train_stylize: Optional[StylizeConfig] = None
    val_stylize: Optional[StylizeConfig] = None
    # optimization (reference defaults: baseline.py:209-219)
    epochs: int = 180
    batch_size: int = 2
    lr: float = 1e-4
    weight_decay: float = 1e-5
    val_interval: int = 2
    # learnable-layer experiments
    alpha0: float = 0.7
    fd_mode: bool = False  # True -> reference finite-difference alpha updates
    fd_h: float = 0.01
    fd_lr: float = 0.02
    spike_intensity: float = 11.0
    freeze_unet: bool = False       # train only the stylization parameter
    unet_optimizer: str = "adam"    # "adam" | "sgd" (reference GD variants)
    transfer_from: Optional[str] = None  # checkpoint dir to warm-start from
    # GAN experiments
    gan_lr: float = 2e-4
    gan_beta1: float = 0.5
    nz: int = 100
    zf_p: float = 0.2
    cyclic_alpha: float = 1.0
    cyclic_gamma: float = 10.0


REGISTRY: Dict[str, ExperimentConfig] = {}


def _register(cfg: ExperimentConfig) -> None:
    if cfg.name in REGISTRY:
        raise ValueError(f"duplicate experiment {cfg.name}")
    REGISTRY[cfg.name] = cfg


def _fmt(v: float) -> str:
    return str(v).replace(".", "p").replace("p0", "") if float(v) == int(v) else \
        str(v).replace(".", "p")


# --- T1 family: 4-channel BraTS, 20_Gibbs_filters/ --------------------------

_register(ExperimentConfig(name="baseline"))

for r in [9, 10, 12.5, 15, 20, 25, 35, 55]:
    sty = StylizeConfig(disk_r=float(r), disk_prob=1.0)
    _register(ExperimentConfig(
        name=f"gibbs{_fmt(r)}", train_stylize=sty, val_stylize=sty))

_register(ExperimentConfig(  # stylized_gibbs_sampled: r ~ U[10, 25]
    name="gibbs_sampled10_25",
    train_stylize=StylizeConfig(disk_r=(10.0, 25.0), disk_prob=1.0),
    val_stylize=StylizeConfig(disk_r=(10.0, 25.0), disk_prob=1.0)))

_register(ExperimentConfig(  # gibbs_data_augmentation.py: train-time RandGibbsNoised
    name="gibbs_augmentation",
    train_stylize=StylizeConfig(gibbs_alpha=(0.0, 1.0), gibbs_prob=1.0)))

# --- 30_plane_waves_filters/ -------------------------------------------------

for intensity in [12, 13, 14, 15, 16, 17]:
    sty = StylizeConfig(plane_axes=(55.0, 55.0, 30.0),
                        plane_intensity=float(intensity), plane_prob=1.0)
    _register(ExperimentConfig(
        name=f"planes{intensity}", train_stylize=sty, val_stylize=sty))

# --- 40_salt_and_pepper/ -----------------------------------------------------

for p in [0.05, 0.15, 0.25, 0.35]:
    sty = StylizeConfig(sap_p=float(p), sap_prob=1.0)
    _register(ExperimentConfig(
        name=f"sap{_fmt(p)}", train_stylize=sty, val_stylize=sty))

# --- 50_wraparound/ ----------------------------------------------------------

for a in [0.0, 0.25, 0.5, 0.75]:
    sty = StylizeConfig(wrap_alpha=float(a), wrap_prob=1.0)
    _register(ExperimentConfig(
        name=f"wrap{_fmt(a)}", train_stylize=sty, val_stylize=sty))

# --- one-channel baselines (100_T2_basline/, 120_Gibbs_oneChannel/) ---------
# BraTS modality order: (FLAIR, T1w, T1gd, T2w); labels TC=0, WT=1, ET=2.

_register(ExperimentConfig(name="baseline_T2", in_channels=1, out_channels=1,
                           select_channel=(3, 0)))  # T2 -> TC
_register(ExperimentConfig(name="baseline_FLAIR", in_channels=1, out_channels=1,
                           select_channel=(0, 1)))  # FLAIR -> WT

for r in [9, 12.5, 15, 20, 25]:
    sty = StylizeConfig(disk_r=float(r), disk_prob=1.0)
    _register(ExperimentConfig(
        name=f"gibbs{_fmt(r)}_FLAIR", in_channels=1, out_channels=1,
        select_channel=(0, 1), train_stylize=sty, val_stylize=sty))

# --- stacked corruptions (125_/126_/127_/140_, FLAIR 1-channel) --------------
# Pipeline order Gibbs -> planes -> wrap -> sap (127_.../:138-141).

for spike_i in [12, 13, 14, 15, 16, 17]:
    sty = StylizeConfig(disk_r=12.5, disk_prob=1.0,
                        spike=True, spike_range=(float(spike_i), float(spike_i)),
                        spike_channel_wise=False, spike_prob=1.0)
    _register(ExperimentConfig(
        name=f"gibbs12p5_spikes{spike_i}_FLAIR", in_channels=1, out_channels=1,
        select_channel=(0, 1), train_stylize=sty, val_stylize=sty))

for wrap_a in [0.0, 0.25, 0.5, 0.75]:
    sty = StylizeConfig(disk_r=12.5, disk_prob=1.0,
                        spike=True, spike_range=(15.0, 15.0),
                        spike_channel_wise=False, spike_prob=1.0,
                        wrap_alpha=float(wrap_a), wrap_prob=1.0)
    _register(ExperimentConfig(
        name=f"gibbs12p5_spikes15_wrap{_fmt(wrap_a)}_FLAIR",
        in_channels=1, out_channels=1, select_channel=(0, 1),
        train_stylize=sty, val_stylize=sty))

for sap_p in [0.05, 0.15, 0.25, 0.35]:
    sty = StylizeConfig(disk_r=12.5, disk_prob=1.0,
                        spike=True, spike_range=(15.0, 15.0),
                        spike_channel_wise=False, spike_prob=1.0,
                        wrap_alpha=0.5, wrap_prob=1.0,
                        sap_p=float(sap_p), sap_prob=1.0)
    _register(ExperimentConfig(
        name=f"gibbs12p5_spikes15_wrap0p5_sap{_fmt(sap_p)}_FLAIR",
        in_channels=1, out_channels=1, select_channel=(0, 1),
        train_stylize=sty, val_stylize=sty))

# --- TCGA hospital-distribution (300_instutional_distribution/) --------------
# 1-channel whole-tumor; 110 epochs (baseline_domain.py:206).

_register(ExperimentConfig(name="baseline_domain", in_channels=1, out_channels=1,
                           epochs=110))
for r in [10, 20, 35, 55, 75, 95]:
    _register(ExperimentConfig(
        name=f"gibbs{r}_domain", in_channels=1, out_channels=1, epochs=110,
        train_stylize=StylizeConfig(disk_r=float(r), disk_prob=1.0),
        val_stylize=StylizeConfig(disk_r=float(r), disk_prob=1.0)))
for i in [6, 8, 10, 12]:
    sty = StylizeConfig(spike=True, spike_range=(float(i), float(i)),
                        spike_channel_wise=False, spike_prob=1.0)
    _register(ExperimentConfig(
        name=f"spikes{i}_domain", in_channels=1, out_channels=1, epochs=110,
        train_stylize=sty, val_stylize=sty))
for p in [0.05, 0.08, 0.15, 0.25]:
    sty = StylizeConfig(sap_p=float(p), sap_prob=1.0)
    _register(ExperimentConfig(
        name=f"sap{_fmt(p)}_domain", in_channels=1, out_channels=1, epochs=110,
        train_stylize=sty, val_stylize=sty))
_register(ExperimentConfig(
    name="gibbs35_spikes10_sap0p08_domain", in_channels=1, out_channels=1,
    epochs=110,
    train_stylize=StylizeConfig(disk_r=35.0, disk_prob=1.0, spike=True,
                                spike_range=(10.0, 10.0),
                                spike_channel_wise=False, spike_prob=1.0,
                                sap_p=0.08, sap_prob=1.0),
    val_stylize=StylizeConfig(disk_r=35.0, disk_prob=1.0, spike=True,
                              spike_range=(10.0, 10.0),
                              spike_channel_wise=False, spike_prob=1.0,
                              sap_p=0.08, sap_prob=1.0)))

# --- data-augmentation variants (300_.../30_augmentation/) -------------------

for a in [0.2, 0.3, 0.4, 0.5]:
    _register(ExperimentConfig(
        name=f"domain_augment_alpha{_fmt(a)}", in_channels=1, out_channels=1,
        epochs=110,
        train_stylize=StylizeConfig(gibbs_alpha=(0.0, float(a)), gibbs_prob=0.1)))
_register(ExperimentConfig(
    name="domain_augment_spikes9_11", in_channels=1, out_channels=1, epochs=110,
    train_stylize=StylizeConfig(spike=True, spike_range=(9.0, 11.0),
                                spike_prob=0.1)))

# Decathlon Heart (Task02) & Spleen (Task09) augmentation variants
# (30_augmentation/6_spleen/baseline_spleen.py:152-160 pattern)
for organ in ["heart", "spleen"]:
    _register(ExperimentConfig(
        name=f"baseline_{organ}", in_channels=1, out_channels=1, epochs=110))
    _register(ExperimentConfig(
        name=f"{organ}_augment_gibbs", in_channels=1, out_channels=1,
        epochs=110,
        train_stylize=StylizeConfig(gibbs_alpha=(0.0, 0.4), gibbs_prob=0.1)))

# --- learnable-layer (GD) experiments (350_stylized_layers/) -----------------

for a0 in [0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]:
    _register(ExperimentConfig(
        name=f"gibbs{_fmt(a0)}_layer_GD", kind="learnable_gibbs",
        in_channels=1, out_channels=1, epochs=110, alpha0=float(a0),
        fd_mode=True))
    _register(ExperimentConfig(
        name=f"gibbs{_fmt(a0)}_layer_grad", kind="learnable_gibbs",
        in_channels=1, out_channels=1, epochs=110, alpha0=float(a0),
        fd_mode=False))
for i in [9, 11, 13]:
    _register(ExperimentConfig(
        name=f"spikes{i}_layer_GD", kind="learnable_spikes",
        in_channels=1, out_channels=1, epochs=110, spike_intensity=float(i),
        fd_mode=True, fd_h=0.05, fd_lr=0.1))

# GD variants: frozen UNet, SGD, lr sweep (SURVEY 2.3 "variants")
_register(ExperimentConfig(
    name="gibbs0p7_layer_GD_frozen", kind="learnable_gibbs", in_channels=1,
    out_channels=1, epochs=110, alpha0=0.7, fd_mode=True, freeze_unet=True))
_register(ExperimentConfig(
    name="gibbs0p7_layer_GD_sgd", kind="learnable_gibbs", in_channels=1,
    out_channels=1, epochs=110, alpha0=0.7, fd_mode=True,
    unet_optimizer="sgd"))
for lr in [0.005, 0.02, 0.08]:
    _register(ExperimentConfig(
        name=f"gibbs0p7_layer_GD_lr{str(lr).replace('.', 'p')}",
        kind="learnable_gibbs", in_channels=1, out_channels=1, epochs=110,
        alpha0=0.7, fd_mode=True, fd_lr=lr))

# --- GANs (50_reconstruction/, 351_adversarial_gibbs/) -----------------------

_register(ExperimentConfig(name="dcgan", kind="dcgan", in_channels=1,
                           spatial=(128, 128), epochs=200, batch_size=4))
_register(ExperimentConfig(name="recon_gan", kind="recon_gan", in_channels=2,
                           spatial=(128, 128), epochs=200, batch_size=4,
                           gan_lr=1e-4, cyclic_alpha=1.0, cyclic_gamma=10.0))
_register(ExperimentConfig(name="recon_gan_freq", kind="recon_gan_freq",
                           in_channels=2, spatial=(128, 128), epochs=400,
                           batch_size=4, gan_lr=1e-4, cyclic_alpha=15.0,
                           cyclic_gamma=0.1))
_register(ExperimentConfig(name="gibbs_gan", kind="gibbs_gan", in_channels=1,
                           spatial=(128, 128), epochs=200, batch_size=4,
                           gan_lr=1e-4, cyclic_alpha=15.0, cyclic_gamma=0.1))


def get(name: str) -> ExperimentConfig:
    return REGISTRY[name]


def names() -> list:
    return sorted(REGISTRY)
