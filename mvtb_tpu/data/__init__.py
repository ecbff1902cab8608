"""Data pipelines: synthetic generator, NIfTI ingest, MONAI-equivalent preprocessing."""

from mvtb_tpu.data.synthetic import batches, cached_batches, decathlon_style_dicts, make_volume
from mvtb_tpu.data.pipeline import (
    Loader,
    StylizedLoader,
    brats_train_pipeline,
    brats_val_pipeline,
)
from mvtb_tpu.data.nifti import DecathlonDataset, read_nifti, reference_val_split
from mvtb_tpu.data.brats_sweep import BratsValIterDataset
from mvtb_tpu.data.prefetch import device_prefetch
from mvtb_tpu.data.slices import RandConcatd, Sliced
from mvtb_tpu.data.tcga import (
    domain_loaders,
    generalization_gap,
    partition_dataset,
    synthetic_hospital_samples,
    tcga_train_pipeline,
    tcga_val_pipeline,
)

__all__ = [
    "batches", "cached_batches", "decathlon_style_dicts", "make_volume",
    "BratsValIterDataset", "device_prefetch",
    "Loader", "StylizedLoader", "brats_train_pipeline", "brats_val_pipeline",
    "DecathlonDataset", "read_nifti", "reference_val_split",
    "RandConcatd", "Sliced",
    "domain_loaders", "generalization_gap", "partition_dataset",
    "synthetic_hospital_samples", "tcga_train_pipeline", "tcga_val_pipeline",
]
