"""IDEAS model zoo + StyleGAN2 side tree."""

from ideas_tpu.models.ideas import (
    DisentanglementEncoder,
    Generator,
    StructureGenerator,
    TensorExtractor,
    ImageLevelDiscriminator,
    CooccurenceDiscriminator,
    DistributionDiscriminator,
    init_model,
)

__all__ = [
    "DisentanglementEncoder",
    "Generator",
    "StructureGenerator",
    "TensorExtractor",
    "ImageLevelDiscriminator",
    "CooccurenceDiscriminator",
    "DistributionDiscriminator",
    "init_model",
]
