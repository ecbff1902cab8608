"""mvtb_tpu — TPU-native medical-vision textural-bias framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``yanielc/medical-vision-textural-bias`` (reference layout documented in
``SURVEY.md``): MRI k-space corruption ops (Gibbs ringing, k-space spikes,
plane waves, wraparound, salt-and-pepper, random zero-fill), a
MONAI-signature-compatible transform API, Flax models (3D ResUNet, DCGAN,
ResUNet GAN, differentiable stylization layers), jitted training steps with
on-device augmentation, a Dice evaluation harness, and pjit/shard_map data
parallelism over a TPU mesh.

Subpackages
-----------
ops          pure-functional k-space corruption ops (jit/vmap/grad-safe)
transforms   dict/array transform API matching the reference's constructors
models       Flax linen model zoo
train        losses, jitted train steps, checkpointing
eval         Dice metric + sweep/evaluation harness
data         synthetic + NIfTI data pipelines, MONAI-equivalent preprocessing
parallel     device mesh + sharding helpers
experiments  config-driven runner replacing the reference's ~90 script clones
compat       import-path shims (``filters_and_operators``, ``stylization_layers``)
"""

__version__ = "0.1.0"
