from grlir.models.grl import GRL, GRLConfig, param_count
from grlir.models.discriminator import (
    PatchGANDiscriminator,
    UNetDiscriminatorSN,
    VGGStyleDiscriminator,
)
from grlir.models.vgg import VGGFeatureExtractor, perceptual_loss
from grlir.models import zoo

__all__ = [
    "GRL", "GRLConfig", "param_count", "UNetDiscriminatorSN",
    "VGGStyleDiscriminator", "PatchGANDiscriminator", "VGGFeatureExtractor",
    "perceptual_loss", "zoo",
]
