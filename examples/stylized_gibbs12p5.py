"""Stylized-Gibbs training script in the reference's own style.

This mirrors the structure of the reference's
``10_scripts/20_Gibbs_filters/stylized_gibbs12p5.py`` (top-of-file constants,
transform pipeline with the corruption appended, UNet + DiceLoss + Adam,
epoch loop with periodic Dice validation and best-checkpointing) running
against mvtb_tpu through the compat import shims — demonstrating that a
reference experiment spec reruns against this framework.

Run: ``python examples/stylized_gibbs12p5.py`` (synthetic data stands in for
BraTS; point DATA_ROOT at a Decathlon Task01_BrainTumour directory to use
real volumes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvtb_tpu import compat

compat.install()

# ---- the reference's import style works against the framework --------------
from filters_and_operators import RandFourierDiskMaskd  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mvtb_tpu.data.synthetic import decathlon_style_dicts  # noqa: E402
from mvtb_tpu.data.pipeline import Loader  # noqa: E402
from mvtb_tpu.eval.plots import save_learning_curves  # noqa: E402
from mvtb_tpu.models import UNet  # noqa: E402
from mvtb_tpu.train import (EpochMetrics, create_seg_state,  # noqa: E402
                            reference_optimizer, seg_eval_step, seg_train_step)
from mvtb_tpu.train.checkpoint import CheckpointManager  # noqa: E402

# ---- experiment constants (the only lines that differ between the ~90
# reference clones) -----------------------------------------------------------
MASK_RADIUS = 12.5
JOB_NAME = f"gibbs{MASK_RADIUS}"
MAX_EPOCHS = int(os.environ.get("MAX_EPOCHS", 4))          # reference: 180
STEPS_PER_EPOCH = int(os.environ.get("STEPS_PER_EPOCH", 8))
VAL_INTERVAL = 2
BATCH_SIZE = 2
SPATIAL = (64, 64, 32)                                      # reference: (128, 128, 64)
DATA_ROOT = os.environ.get("DATA_ROOT")                     # optional real BraTS
WORKDIR = os.environ.get("WORKDIR", f"/tmp/{JOB_NAME}")

# ---- data -------------------------------------------------------------------
# The corruption transform is part of the *spec* exactly as the reference
# writes it; the runner maps it onto the fused on-device path for training.
corruption = RandFourierDiskMaskd(keys="image", r=MASK_RADIUS,
                                  inside_off=False, prob=1.0)

if DATA_ROOT:
    from mvtb_tpu.data import DecathlonDataset, brats_train_pipeline

    train_ds = DecathlonDataset(DATA_ROOT, "Task01_BrainTumour",
                                transform=brats_train_pipeline(SPATIAL),
                                section="training",
                                cache_dir=os.path.join(WORKDIR, "cache"))
    samples = [train_ds[i] for i in range(len(train_ds))]
else:
    samples = decathlon_style_dicts(0, 16, channels=4, spatial=SPATIAL,
                                    n_classes=3)

val_samples = [corruption(dict(s)) for s in samples[-4:]]
train_samples = samples[:-4]

train_loader = Loader(train_samples, batch_size=BATCH_SIZE, shuffle=True, seed=0)
val_loader = Loader(val_samples, batch_size=BATCH_SIZE)

# ---- model / loss / optimizer (baseline.py:198-210) -------------------------
from mvtb_tpu.ops.fused import StylizeConfig  # noqa: E402

model = UNet(out_channels=3, channels=(16, 32, 64, 128, 256),
             strides=(2, 2, 2, 2), num_res_units=2)
state = create_seg_state(jax.random.key(0), model, (1,) + SPATIAL + (4,),
                         tx=reference_optimizer(1e-4, 1e-5))
n_params = sum(x.size for x in jax.tree.leaves(state.params))
print("Model instantiated with number of parameters =", n_params)

train_stylize = StylizeConfig(disk_r=MASK_RADIUS, disk_prob=1.0)

# ---- training loop (baseline.py:232-318) ------------------------------------
os.makedirs(WORKDIR, exist_ok=True)
ckpt = CheckpointManager(os.path.join(WORKDIR, "ckpt"),
                         best_metric="mean_dice", best_mode="max")
key = jax.random.key(1)
best_metric, best_epoch = -1.0, -1
history = {"loss": [], "dice": [], "epochs": []}

for epoch in range(MAX_EPOCHS):
    print("-" * 10)
    print(f"epoch {epoch + 1}/{MAX_EPOCHS}")
    epoch_loss, step = 0.0, 0
    for batch in train_loader:
        key, sub = jax.random.split(key)
        state, loss = seg_train_step(state, jnp.asarray(batch["image"]),
                                     jnp.asarray(batch["label"]), sub,
                                     train_stylize)
        epoch_loss += float(loss)
        step += 1
        if step >= STEPS_PER_EPOCH:
            break
    epoch_loss /= max(step, 1)
    history["loss"].append(epoch_loss)
    print(f"epoch {epoch + 1} average loss: {epoch_loss:.4f}")

    if (epoch + 1) % VAL_INTERVAL == 0:
        metrics = EpochMetrics()
        for batch in val_loader:
            metrics.update(seg_eval_step(state, jnp.asarray(batch["image"]),
                                         jnp.asarray(batch["label"])))
        result = metrics.result()
        history["dice"].append(result)
        history["epochs"].append(epoch + 1)
        tc, wt, et = result["per_class"]
        metric = result["mean"]
        if metric > best_metric:
            best_metric, best_epoch = metric, epoch + 1
            ckpt.save(epoch + 1, state, metrics={"mean_dice": metric})
            print("saved new best metric model")
        print(f"current epoch: {epoch + 1} current mean dice: {metric:.4f}"
              f" tc: {tc:.4f} wt: {wt:.4f} et: {et:.4f}"
              f"\nbest mean dice: {best_metric:.4f} at epoch: {best_epoch}")

print(f"train completed, best_metric: {best_metric:.4f} at epoch: {best_epoch}")

ckpt.wait()
ckpt.close()
save_learning_curves(history, os.path.join(
    WORKDIR, f"trainLoss_and_meanValScore_{JOB_NAME}.png"))
print("learning curves saved to", WORKDIR)
