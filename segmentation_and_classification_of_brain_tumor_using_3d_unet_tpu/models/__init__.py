from .unet3d import UNet3D, DoubleConv3D, AttentionGate3D, GroupNorm
from .classifier import BrainTumorClassifier

__all__ = ["UNet3D", "DoubleConv3D", "AttentionGate3D", "GroupNorm",
           "BrainTumorClassifier"]
