"""Losses, jitted train steps, and checkpointing."""

from mvtb_tpu.train.chunked import make_chunk_fn, train_chunked
from mvtb_tpu.train.losses import bce_with_logits, dice_loss, mse
from mvtb_tpu.train.seg import (
    EpochMetrics,
    TrainState,
    create_seg_state,
    reference_optimizer,
    seg_eval_step,
    seg_train_step,
    train_segmentation,
)
from mvtb_tpu.train.gan import (
    GANState,
    create_gan_state,
    dcgan_step,
    gan_optimizer,
    recon_gan_step,
)
from mvtb_tpu.train.learnable import (
    create_learnable_state,
    fd_train_step,
    learnable_train_step,
)

__all__ = [
    "bce_with_logits", "dice_loss", "make_chunk_fn", "mse", "train_chunked",
    "EpochMetrics", "TrainState", "create_seg_state", "reference_optimizer",
    "seg_eval_step", "seg_train_step", "train_segmentation",
    "GANState", "create_gan_state", "dcgan_step", "gan_optimizer",
    "recon_gan_step",
    "create_learnable_state", "fd_train_step", "learnable_train_step",
]
