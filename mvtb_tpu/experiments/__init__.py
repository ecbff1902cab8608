"""Config-driven experiment system replacing the reference's script clones."""

from mvtb_tpu.experiments.registry import REGISTRY, ExperimentConfig, get, names
from mvtb_tpu.experiments.runner import run, run_domain_experiment

__all__ = ["REGISTRY", "ExperimentConfig", "get", "names", "run", "run_domain_experiment"]
