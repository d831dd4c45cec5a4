from .tools import get_kl_loss, update_prior_ema, sample_rngs, extract_bayes_prior

__all__ = ["get_kl_loss", "update_prior_ema", "sample_rngs", "extract_bayes_prior"]
