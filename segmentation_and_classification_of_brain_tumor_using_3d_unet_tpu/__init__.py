"""TPU-native brain-tumor segmentation & classification framework.

A ground-up JAX/XLA/Pallas/pjit re-design of
Ruhul-sde/Segmentation-and-classification-of-brain-tumor-using-3D-UNet
(reference mounted read-only at /root/reference — see SURVEY.md for the
component-by-component parity map).

Quick start::

    import segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu as bt

    cfg = bt.config.get_config("fast")
    model = bt.models.UNet3D(features=cfg.model.features)
"""

from . import config
from . import losses
from . import metrics
from . import models
from . import ops

__version__ = "0.1.0"

__all__ = ["config", "losses", "metrics", "models", "ops", "__version__"]
