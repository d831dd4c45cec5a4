from .models import Decomp
from .decomp import CompactTwoBranchModel
from .loss import RetinexLoss, total_variation_loss, frequency_regularization

__all__ = ["Decomp", "CompactTwoBranchModel", "RetinexLoss",
           "total_variation_loss", "frequency_regularization"]
