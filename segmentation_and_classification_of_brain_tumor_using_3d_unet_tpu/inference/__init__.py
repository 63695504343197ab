from .predictor import Predictor, preprocess_image
from .sliding_window import (compute_patch_starts, gaussian_importance_map,
                             make_sw_predictor, sliding_window_inference)

__all__ = ["Predictor", "preprocess_image", "compute_patch_starts",
           "gaussian_importance_map", "make_sw_predictor",
           "sliding_window_inference"]
