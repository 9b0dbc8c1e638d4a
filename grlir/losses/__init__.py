from grlir.losses.pixel import (
    LOSS_FNS,
    charbonnier_loss,
    l1_loss,
    mse_loss,
    tv_loss,
    weighted_loss,
)
from grlir.losses.gan import gan_loss

__all__ = [
    "LOSS_FNS", "charbonnier_loss", "l1_loss", "mse_loss", "tv_loss",
    "weighted_loss", "gan_loss",
]
