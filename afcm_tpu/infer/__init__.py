from .predictor import StandardPredictor, get_predictor, remove_halo

__all__ = ["StandardPredictor", "get_predictor", "remove_halo"]
