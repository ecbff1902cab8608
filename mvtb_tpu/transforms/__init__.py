"""Reference-compatible transform API (MONAI-style array + dict transforms)."""

from mvtb_tpu.transforms.base import (
    Compose,
    KeysCollection,
    MapTransform,
    Randomizable,
    RandomizableTransform,
    ReCompose,
    Transform,
    ensure_tuple,
)
from mvtb_tpu.transforms.array import (
    GibbsNoise,
    KSpaceSpikeNoise,
    RandGibbsNoise,
    RandKSpaceSpikeNoise,
    RandZF,
    WrapArtifact,
)
from mvtb_tpu.transforms.dictionary import (
    ConvertToMultiChannelBasedOnBratsClassesd,
    MultimodalSlicesd,
    RandFourierDiskMaskd,
    RandGibbsNoised,
    RandKSpaceSpikeNoised,
    RandPlaneWaves_ellipsoid,
    SaltAndPepper,
    SegmentationSlicesd,
    SelectChanneld,
    WholeTumorTCGA,
    WrapArtifactd,
)

__all__ = [
    "Compose", "KeysCollection", "MapTransform", "Randomizable",
    "RandomizableTransform", "ReCompose", "Transform", "ensure_tuple",
    "GibbsNoise", "KSpaceSpikeNoise", "RandGibbsNoise", "RandKSpaceSpikeNoise",
    "RandZF", "WrapArtifact",
    "ConvertToMultiChannelBasedOnBratsClassesd", "MultimodalSlicesd",
    "RandFourierDiskMaskd",
    "RandGibbsNoised", "RandKSpaceSpikeNoised", "RandPlaneWaves_ellipsoid",
    "SaltAndPepper", "SegmentationSlicesd", "SelectChanneld", "WholeTumorTCGA",
    "WrapArtifactd",
]
