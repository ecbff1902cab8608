"""Cross-corruption evaluation sweep — the comparison-notebook workflow
(``20_results/80_common_evaluations/comparison_on_*.ipynb``) as a script.

Trains two small models (clean baseline + Gibbs-stylized), evaluates both on
a grid of corrupted validation sets via the sweep harness, writes the Dice
table (JSON + pickle, like the reference's ``model_evaluation`` records) and
the grouped-bar comparison figure.

Run: ``python examples/evaluation_sweep.py`` (env: EPOCHS, WORKDIR).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from mvtb_tpu.data.synthetic import decathlon_style_dicts  # noqa: E402
from mvtb_tpu.eval.harness import ModelEvaluation, TransformSweep  # noqa: E402
from mvtb_tpu.eval.plots import plot_model_performance  # noqa: E402
from mvtb_tpu.experiments import ExperimentConfig, run  # noqa: E402
from mvtb_tpu.ops.fused import StylizeConfig  # noqa: E402
from mvtb_tpu.transforms import GibbsNoise, SaltAndPepper, WrapArtifactd  # noqa: E402

EPOCHS = int(os.environ.get("EPOCHS", 2))
WORKDIR = os.environ.get("WORKDIR", "/tmp/eval_sweep")
SPATIAL = (64, 64, 32)
os.makedirs(WORKDIR, exist_ok=True)

small = dict(channels=(8, 16, 32), strides=(2, 2), spatial=SPATIAL,
             batch_size=2, val_interval=max(EPOCHS, 1))

models = {}
for name, sty in [
    ("baseline", None),
    ("gibbs12.5", StylizeConfig(disk_r=12.5, disk_prob=1.0)),
]:
    cfg = ExperimentConfig(name=name, train_stylize=sty, **small)
    print(f"== training {name} ==")
    models[name] = run(cfg, epochs=EPOCHS, steps_per_epoch=6, verbose=True)

# validation pool + named corruption grid (the sweep of the eval notebooks)
samples = decathlon_style_dicts(7, 8, channels=4, spatial=SPATIAL, n_classes=3)


def gibbs(alpha):
    t = GibbsNoise(alpha)
    return lambda d: {**d, "image": np.asarray(t(d["image"]))}


grid = {
    "clean": None,
    "gibbs0.3": gibbs(0.3),
    "gibbs0.6": gibbs(0.6),
    "wrap0.5": WrapArtifactd(keys="image", alpha=0.5),
    "sap0.15": SaltAndPepper(p=0.15, keys="image").set_random_state(0),
}

eval_dicts = {}
for name, result in models.items():
    state = result["state"]
    ev = ModelEvaluation(state.apply_fn, state.params,
                         instance_name=os.path.join(WORKDIR, f"{name}_model"))
    for ds_name, loader in TransformSweep(samples, grid, batch_size=2):
        ev.add_eval(ds_name, loader)
        print(f"{name} on {ds_name}: mean dice {ev.eval_dict[ds_name][0]:.4f}")
    ev.save()
    eval_dicts[name] = {k: v for k, v in ev.eval_dict.items()}

fig = plot_model_performance(eval_dicts, os.path.join(WORKDIR, "comparison.png"))
print("table + figure written to", WORKDIR)
