from .models import Decomp
from .loss import RetinexLoss, total_variation_loss, frequency_regularization

__all__ = ["Decomp", "RetinexLoss", "total_variation_loss", "frequency_regularization"]
